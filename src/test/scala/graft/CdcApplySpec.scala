package graft

import graft.sources.{Scratch, Sinks}
import graft.streaming.CdcApply
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming CDC apply: micro-batched changes land on a partitioned
  * table through bounded-footprint merges, and the final state equals
  * the batch merge of the equivalent collapsed changeset — with
  * intra-batch multi-change keys resolved by sequence, untouched
  * partitions' files preserved, and the table readable between batches.
  */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("k", "v", "amt", "yr", "seq", "del")

  private def writeBase(path: String): Unit =
    Sinks.writePartitioned(
      Seq((1L, "a", 10.0, 2020), (2L, "b", 20.0, 2020),
        (3L, "c", 30.0, 2021), (5L, "e", 50.0, 2022))
        .toDF("k", "v", "amt", "yr"),
      path, Seq("yr"))

  private def state(path: String): Set[(Long, String, Double, Int)] =
    spark.read.parquet(path).select(col("k"), col("v"), col("amt"), col("yr"))
      .as[(Long, String, Double, Int)].collect().toSet

  test("micro-batched CDC converges to the batch-merge state") {
    val table = Scratch.dir("cdc_table")
    val src = Scratch.dir("cdc_src")
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toString
    writeBase(table)
    // batch 1: update k=3 twice in one batch (seq decides), insert k=4
    val b1 = Seq(
      (3L, "c_old", 31.0, 2021, 1L, false),
      (3L, "c_new", 33.0, 2021, 2L, false),
      (4L, "d", 40.0, 2021, 1L, false))
      .toDF(cols: _*)
    b1.write.mode("overwrite").parquet(src)
    val untouched2020 = {
      val d = new java.io.File(s"$table/yr=2020")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val q = CdcApply.applyStream(
      spark.readStream.schema(b1.schema).parquet(src),
      table, Seq("k"), Seq("yr"), "seq", "del", ckpt)
    q.processAllAvailable()
    assert(state(table) == Set(
      (1L, "a", 10.0, 2020), (2L, "b", 20.0, 2020),
      (3L, "c_new", 33.0, 2021), (4L, "d", 40.0, 2021),
      (5L, "e", 50.0, 2022)),
      "batch 1 did not apply the per-key-latest changes")
    // batch 2: delete k=5 (empties yr=2022), move k=4 into 2022
    Seq((5L, "e", 50.0, 2022, 3L, true),
      (4L, "d", 40.0, 2022, 4L, false))
      .toDF(cols: _*)
      .write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    assert(state(table) == Set(
      (1L, "a", 10.0, 2020), (2L, "b", 20.0, 2020),
      (3L, "c_new", 33.0, 2021),
      (4L, "d", 40.0, 2022)),
      "batch 2 did not apply delete + cross-partition move")
    // 2020 was in no batch's footprint: exact same files across BOTH merges
    val after2020 = {
      val d = new java.io.File(s"$table/yr=2020")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    assert(after2020 == untouched2020,
      "a partition outside every batch's footprint was rewritten")
  }

  test("intra-batch collapse keeps the highest sequence; delete wins ties") {
    val b = Seq(
      (7L, "x1", 1.0, 2020, 1L, false),
      (7L, "x2", 2.0, 2020, 3L, false),
      (7L, "x_stale", 0.0, 2020, 2L, false),
      (8L, "y", 1.0, 2020, 5L, false),
      (8L, "y", 1.0, 2020, 5L, true))
      .toDF(cols: _*)
    val got = CdcApply.latestPerKey(b, Seq("k"), "seq", "del")
      .select(col("k"), col("v"), col("del"))
      .as[(Long, String, Boolean)].collect().toSet
    assert(got == Set((7L, "x2", false), (8L, "y", true)))
  }
}
