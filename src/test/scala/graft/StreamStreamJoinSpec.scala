package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Stream-stream event-time join (§2.12): the click-attribution shape
  * with bounded state on BOTH sides — batch parity for in-window pairs,
  * and the watermark actually evicting impression state (a too-late
  * click finds nothing, where a batch join would still match).
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attribution join: batch parity in-window; out-of-window never matches") {
    val imps = Seq((1L, ts("2024-01-01 10:00:00"), "banner"),
      (2L, ts("2024-01-01 10:00:00"), "video"))
      .toDF("user_id", "imp_ts", "creative")
    val clicks = Seq(
      (1L, ts("2024-01-01 10:05:00")), // in window (10 min)
      (1L, ts("2024-01-01 10:20:00")), // outside the window
      (3L, ts("2024-01-01 10:01:00")) // no impression at all
    ).toDF("user_id", "click_ts")
    val iDir = Files.createTempDirectory("graft_ss_imp").toString
    val cDir = Files.createTempDirectory("graft_ss_clk").toString
    imps.write.mode("overwrite").parquet(iDir)
    clicks.write.mode("overwrite").parquet(cDir)
    def watermarked(dir: String, schema: DataFrame, tsCol: String) =
      spark.readStream.schema(schema.schema).parquet(dir)
        .withWatermark(tsCol, "5 minutes")
    val q = StreamOps.streamStreamAttribution(
        watermarked(iDir, imps, "imp_ts"), watermarked(cDir, clicks, "click_ts"),
        "user_id", "imp_ts", "click_ts", within = "10 MINUTES")
      .select("user_id", "creative", "latency_seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM attr_out")
      .as[(Long, String, Double)].collect().toSet
    val batch = StreamOps.streamStreamAttribution(imps, clicks,
        "user_id", "imp_ts", "click_ts", within = "10 MINUTES")
      .select("user_id", "creative", "latency_seconds")
      .as[(Long, String, Double)].collect().toSet
    assert(got == batch)
    assert(got == Set((1L, "banner", 300.0)))
  }

  test("watermark discipline: once BOTH sides advance, a late click matches nothing") {
    val iDir = Files.createTempDirectory("graft_ss_imp2").toString
    val cDir = Files.createTempDirectory("graft_ss_clk2").toString
    val imps = Seq((2L, ts("2024-01-01 10:00:00"), "video"))
      .toDF("user_id", "imp_ts", "creative")
    val c1 = Seq((2L, ts("2024-01-01 10:02:00"))).toDF("user_id", "click_ts")
    imps.write.mode("overwrite").parquet(iDir)
    c1.write.mode("overwrite").parquet(cDir)
    def watermarked(dir: String, schema: DataFrame, tsCol: String) =
      spark.readStream.schema(schema.schema).parquet(dir)
        .withWatermark(tsCol, "5 minutes")
    val q = StreamOps.streamStreamAttribution(
        watermarked(iDir, imps, "imp_ts"), watermarked(cDir, c1, "click_ts"),
        "user_id", "imp_ts", "click_ts", within = "10 MINUTES")
      .select("user_id", "latency_seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_late").start()
    q.processAllAvailable()
    // batch 2 advances BOTH event-time fronts far past the join window
    // (the global watermark is min(sides) — advancing only one side
    // keeps every impression buffered, by design)
    Seq((8L, ts("2024-01-01 12:00:00"), "later"))
      .toDF("user_id", "imp_ts", "creative")
      .write.mode("append").parquet(iDir)
    Seq((9L, ts("2024-01-01 12:00:00"))).toDF("user_id", "click_ts")
      .write.mode("append").parquet(cDir)
    q.processAllAvailable()
    // batch 3: a click that WOULD match user 2's impression (10:06 is
    // inside the 10-minute window) but arrives after the watermark
    // passed — the impression's state is gone and the row is late; a
    // batch join would still match it
    Seq((2L, ts("2024-01-01 10:06:00"))).toDF("user_id", "click_ts")
      .write.mode("append").parquet(cDir)
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT * FROM attr_late")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((2L, 120.0)), s"expected only the on-time click, got $got")
  }
}
