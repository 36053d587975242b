package graft

import graft.operators.TimeSeries
import graft.streaming.StreamingEwma
import graft.streaming.StreamingEwma.EwmaIn
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The smoothing recursion as one double of keyed state: batch/stream
  * parity with the state surviving ACROSS micro-batches — the property
  * that distinguishes real stateful streaming from per-batch maps.
  */
class StreamingEwmaSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ewma equals the batch fold, state carried across batches") {
    val b1 = Seq(EwmaIn("a", 1, 10.0), EwmaIn("a", 2, 20.0),
      EwmaIn("b", 1, 5.0))
    val b2 = Seq(EwmaIn("a", 3, 30.0), EwmaIn("b", 2, 15.0),
      EwmaIn("c", 1, 1.0))
    val dir = Files.createTempDirectory("graft_stream_ewma").toString
    b1.toDF().write.mode("overwrite").parquet(dir)
    val q = StreamingEwma.ewma(
        spark.readStream.schema(b1.toDF().schema).parquet(dir).as[EwmaIn],
        alpha = 0.5)
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_stream").start()
    q.processAllAvailable()
    // batch 2 lands later — 'a' and 'b' must continue from their state,
    // NOT restart the recursion
    b2.toDF().write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()
    val stream = spark.sql("SELECT key, t, ewma FROM ewma_stream")
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    val batch = TimeSeries.ewma((b1 ++ b2).toDF(), Seq("key"), "t",
        col("x"), alpha = 0.5)
      .select(col("key"), col("t"), col("ewma"))
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    assert(stream.keySet == batch.keySet && stream.nonEmpty)
    // batch rounds to 6 dp at output; the stream emits raw doubles
    stream.foreach { case (k, v) =>
      assert(math.abs(v - batch(k)) < 1e-6, s"$k: stream $v vs batch ${batch(k)}")
    }
    // the cross-batch point, hand-checked: a3 = 0.5·30 + 0.5·(0.5·20 + 0.5·10)
    assert(stream(("a", 3L)) == 22.5)
    assert(stream(("b", 2L)) == 10.0)
    assert(stream(("c", 1L)) == 1.0, "fresh key starts its own recursion")
  }

  test("out-of-order rows WITHIN a micro-batch are folded in order-key order") {
    val rows = Seq(EwmaIn("k", 3, 30.0), EwmaIn("k", 1, 10.0),
      EwmaIn("k", 2, 20.0))
    val dir = Files.createTempDirectory("graft_stream_ewma_ooo").toString
    rows.toDF().write.mode("overwrite").parquet(dir)
    val q = StreamingEwma.ewma(
        spark.readStream.schema(rows.toDF().schema).parquet(dir).as[EwmaIn],
        alpha = 0.5)
      .writeStream.outputMode("append").format("memory")
      .queryName("ewma_ooo").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT t, ewma FROM ewma_ooo")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 10.0, 2L -> 15.0, 3L -> 22.5))
  }
}
