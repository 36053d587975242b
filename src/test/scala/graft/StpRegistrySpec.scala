package graft

import graft.sources.{FixedWidth, Scratch, StpRegistry}
import org.apache.spark.sql.functions._

/** The transcribed STP colspec registry (SFMuniDataHelper.py:71-170) and
  * its reading rules: registry integrity, the int64-via-float64 forcing,
  * na-values + SEQ dropna for repeated mid-file headers, and the
  * revenue-service filters. */
class StpRegistrySpec extends SparkSpec {

  test("registry integrity: 98 windows, monotone, 62-column default set") {
    assert(StpRegistry.entries.size == 98)
    assert(StpRegistry.defaultColumns.size == 62)
    assert(StpRegistry.defaultColumns.last.name == "PULLOUT_INT")
    // windows never overlap and never run backwards (LOADCODE's declared
    // zero-width window is legal and preserved)
    StpRegistry.entries.sliding(2).foreach { case Seq(a, b) =>
      assert(a.end <= b.start, s"${a.name} overlaps ${b.name}")
      assert(a.start <= a.end)
    }
    assert(StpRegistry.entries.map(_.name).distinct.size == 98)
    val byName = StpRegistry.entries.map(e => e.name -> e).toMap
    assert(byName("LOADCODE").start == byName("LOADCODE").end)
    // spot-check transcription against the reference rows
    assert(byName("SEQ") == StpRegistry.Entry("SEQ", 0, 5, 'I'))
    assert(byName("LAT") == StpRegistry.Entry("LAT", 94, 102, 'F'))
    assert(byName("CARS") == StpRegistry.Entry("CARS", 544, 547, 'I'))
  }

  test("read: int64 forcing, mid-file header dropna, revenue filters") {
    val dir = Scratch.dir("stp_spec")
    new java.io.File(dir).mkdirs()
    // build three aligned lines with the writer, then corrupt the middle
    // one into a repeated header (the reference's na_values=['ID'] +
    // dropna(subset=['SEQ']) path) and write one int field as '12.0'
    // (the misaligned-row case the float64->int64 forcing exists for)
    import spark.implicits._
    val base = Seq(
      (1L, 101L, "S101", 7L, 1L, 0L, 10L, 240115L),
      (2L, 102L, "S102", 9L, 1L, 30L, 10L, 240115L), // QC201 30 -> filtered
      (3L, 103L, "S103", 11L, 6L, 0L, 10L, 240115L)) // DIR 6 -> filtered
      .toDF("SEQ", "STOP_AVL", "STOPNAME_AVL", "ON", "DIR", "QC201",
        "ROUTE_AVL", "DATE_INT")
    val cols = StpRegistry.defaultColumns.map { e =>
      (base.columns.toSet.contains(e.name) match {
        case true  => col(e.name)
        case false => e.kind match {
          case 'I' => lit(0L); case 'F' => lit(0.0); case _ => lit("")
        }
      }).as(e.name)
    }
    val lines = base.select(cols: _*)
      .select(FixedWidth.formatLine(
        StpRegistry.writerSpecs(StpRegistry.defaultColumns)).as("value"))
      .as[String].collect().toSeq.sortBy(_.take(5).trim.toInt)
    // line for SEQ=1 gets ON rewritten to '12.0' shifted into the window;
    // ON is (55, 58) -> too narrow for '12.0', so use ARRIVAL_TIME_INT
    // (48, 54), width 6
    val forced = lines.head.patch(48, "  12.0", 6)
    val headerish = "   ID" + " " * 100
    val all = Seq(forced, headerish, lines(1), lines(2))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/stp.txt"),
      String.join("\n", all: _*).getBytes("UTF-8"))
    val df = StpRegistry.read(spark, s"$dir/stp.txt")
    // header row dropped by the SEQ dropna; '12.0' forced to 12L
    assert(df.count() == 3)
    val r1 = df.where(col("SEQ") === 1).select("ARRIVAL_TIME_INT", "ON")
      .as[(Long, Long)].collect().head
    assert(r1 == ((12L, 7L)))
    // revenue-service: QC201 30 and DIR 6 rows go
    val rev = StpRegistry.revenueService(df)
    assert(rev.select("SEQ").as[Long].collect().toSeq == Seq(1L))
  }
}
