package graft

import org.apache.spark.sql.functions._
import graft.sources.Scratch

/** Timestamp-type canaries: every catalog query must ANALYZE cleanly no
  * matter which parquet timestamp encoding the driver's `events.ts`
  * arrives in. Round 5 shipped q113 broken because its unit fixtures only
  * ever used `TimestampType` while the driver's testdata had moved to
  * `TIMESTAMP_NTZ` — `unix_micros`/`cast(ts as double)` reject NTZ at
  * analysis time, so the break was invisible to the suite but fatal on
  * the driver surface. These sweeps pin the contract: a query that calls
  * an NTZ-intolerant function on a raw event column fails HERE, not in
  * the driver's bench.
  *
  * Analysis (not execution) is the right altitude: `DATATYPE_MISMATCH`
  * for a bad cast/function is thrown by the analyzer, and analyzing all
  * ~126 queries twice costs seconds where executing them would cost
  * minutes. (Queries that eagerly execute during construction — literal
  * codebook collects, PageRank's checkpointed rounds — simply run at
  * sf0.001 as they already do in PlanQualitySpec.)
  */
class TimestampTypeCanarySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** A twin of the sf0.001 directory whose events.ts carries the given
    * Spark type; every other table is byte-identical (hard copy — the
    * source tree is read-only so links would leak read-only mounts into
    * scratch cleanup). */
  private def twin(tsType: String): String = {
    val dir = Scratch.dir(s"tscanary_${tsType.replace("_", "")}")
    val d = new java.io.File(dir)
    if (!d.exists()) {
      d.mkdirs()
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "documents", "embeddings"))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sf/$t.parquet"),
          java.nio.file.Paths.get(s"$dir/$t.parquet"))
      // normalize through Tables.events first so the rewrite starts from
      // the canonical TIMESTAMP, then force the encoding under test
      Tables.events(spark, sf)
        .withColumn("ts", col("ts").cast(tsType))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    dir
  }

  private def sweep(tsType: String): Unit = {
    val dir = twin(tsType)
    // the fixture must actually carry the type under test, else the sweep
    // proves nothing
    val got = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val want = org.apache.spark.sql.types.DataType.fromDDL(tsType)
    assert(got == want, s"twin fixture has ts: $got, expected $want")
    Queries.all.foreach { q =>
      try q.run(spark, dir).queryExecution.analyzed
      catch {
        case e: Throwable =>
          fail(s"${q.name} fails analysis with events.ts as $tsType: " +
            e.getMessage.linesIterator.take(3).mkString(" | "))
      }
    }
  }

  test("every catalog query analyzes with events.ts as TIMESTAMP") {
    sweep("timestamp")
  }

  test("every catalog query analyzes with events.ts as TIMESTAMP_NTZ") {
    sweep("timestamp_ntz")
  }

  /** The catalog sweeps above prove the INGESTION contract
    * (Tables.events normalizes NTZ before any operator sees it) — they
    * cannot prove the operators' own via-timestamp casts, because the
    * normalized column is always TIMESTAMP by the time a query touches
    * it. A library caller handing an operator a raw NTZ column (the
    * q126 shape: direct parquet read, no Tables) hits the call sites
    * directly, so each hardened operator is exercised here with an NTZ
    * frame and must produce the SAME result as its TIMESTAMP twin. */
  test("library operators are total over raw TIMESTAMP_NTZ inputs") {
    import org.apache.spark.sql.functions._
    def events(tsType: String) = spark.range(8).select(
      (col("id") % 2).as("user_id"),
      timestamp_seconds(col("id") * 61).cast(tsType).as("ts"),
      col("id").as("event_id"),
      (col("id") % 3).cast("double").as("value"))

    // RuleAgg MeanTime (RuleAgg.scala unix_micros site)
    def meanTimes(tsType: String) = graft.agg.RuleAgg.aggregate(
      events(tsType), Seq("user_id"),
      Seq(graft.agg.AggRule("mean_ts", "ts", graft.agg.AggMethod.MeanTime)))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSeq
    assert(meanTimes("timestamp_ntz") == meanTimes("timestamp"))

    // TrajectorySim (TrajectorySim.scala unix_micros site)
    def hausdorff(tsType: String) = graft.operators.TrajectorySim
      .hausdorffTopK(events(tsType), "user_id", "ts", "event_id", "value",
        k = 1, isProbe = col("id") >= 0)
      .orderBy("id1").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(hausdorff("timestamp_ntz") == hausdorff("timestamp"))

    // Taxi segmentation (Taxi.scala cast-to-double site)
    def seg(tsType: String) = graft.pipelines.Taxi.segmentPoints(
        events(tsType).withColumn("x", col("value") * 10)
          .withColumn("y", col("value") * 5)
          .withColumn("status", lit("metered")),
        Seq("user_id"), "ts", "event_id", "x", "y", "status")
      .select(col("user_id"), col("event_id"), col("seconds"))
      .orderBy("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.toString))).toSeq
    assert(seg("timestamp_ntz") == seg("timestamp"))
  }
}
