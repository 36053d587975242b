package graft

import graft.operators.TrajectorySim
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TrajectorySimSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("hausdorff: hand-computed distances, symmetric, rank order total") {
    // user 1: (0,10), (1,10); user 2: (0,10), (1,13); user 3: (0,20), (1,20)
    val events = Seq(
      (1L, ts(0), 1L, 10.0), (1L, ts(1), 2L, 10.0),
      (2L, ts(0), 3L, 10.0), (2L, ts(1), 4L, 13.0),
      (3L, ts(0), 5L, 20.0), (3L, ts(1), 6L, 20.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TrajectorySim.hausdorffTopK(events, "user_id", "ts",
        "event_id", "value", k = 2, isProbe = col("id") === 1L,
        cellWidth = 100.0) // one cell: every pair compared
      .orderBy("rk")
      .as[(Long, Int, Long, Double)].collect()
    // H(1,2): point (1,13) is 3.0 from (1,10) -> 3.0
    // H(1,3): both points of 3 are 10.0 away in v -> 10.0
    assert(out.toSeq == Seq((1L, 1, 2L, 3.0), (1L, 2, 3L, 10.0)))
  }

  test("blocking is exact within the cell width") {
    // min values 9.9 and 10.1 (gap 0.2 < cellWidth 5) must be compared
    // even when they land in adjacent cells (floor(9.9/5)=1, floor(10.1/5)=2)
    val events = Seq(
      (1L, ts(0), 1L, 9.9), (2L, ts(0), 2L, 10.1))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TrajectorySim.hausdorffTopK(events, "user_id", "ts",
        "event_id", "value", k = 1, isProbe = col("id") === 1L,
        cellWidth = 5.0)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.length == 1 && out(0)._3 == 2L)
    assert(math.abs(out(0)._4 - 0.2) < 1e-9)
  }

  test("per-key point bound actually fires on a runaway key") {
    // a second small key must survive the pair filter, or the empty
    // result would let Spark skip evaluating the guarded column entirely
    def keyed(n: Long, key: Long, tieBase: Long) =
      spark.range(n).select(lit(key).as("user_id"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"),
        (col("id") + tieBase).as("event_id"), lit(1.0).as("value"))
    val big = keyed(TrajectorySim.MaxPointsPerKey + 1L, 0L, 0L)
      .unionAll(keyed(5L, 1L, 10000000L))
    val e = intercept[Exception] {
      TrajectorySim.hausdorffTopK(big, "user_id", "ts", "event_id", "value",
        k = 1, isProbe = col("id") === 1L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("trajectory exceeds")), s"got: $e")
  }

  test("min-value blocking survives the multiplicity case that breaks mean blocking") {
    // H(A,B) = 2 but mean_v(A)=25 vs mean_v(B)=75 — mean cells (5 vs 15,
    // width 5) would never compare the pair; the min_v bound
    // (|min_v(A)-min_v(B)| <= H) keeps both in cell 0 and finds it
    val events = Seq(
      (1L, ts(0), 1L, 0.0), (1L, ts(1), 2L, 0.0),
      (1L, ts(2), 3L, 0.0), (1L, ts(3), 4L, 100.0),
      (2L, ts(0), 5L, 0.0), (2L, ts(1), 6L, 100.0),
      (2L, ts(2), 7L, 100.0), (2L, ts(3), 8L, 100.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TrajectorySim.hausdorffTopK(events, "user_id", "ts",
        "event_id", "value", k = 1, isProbe = col("id") === 1L,
        cellWidth = 5.0)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.length == 1 && out(0)._3 == 2L,
      "the H=2 neighbor must be found despite a mean gap of 50")
    assert(math.abs(out(0)._4 - 2.0) < 1e-9)
  }
}
