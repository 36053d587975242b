package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

/** Funnel and cohort semantics on hand-checkable fixtures. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))

  test("windowFunnel: order matters, window caps completion, greedy anchor") {
    val df = ev(
      // u1 completes in order inside the window
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-02 10:00:00", "click"),
      (1L, "2024-01-03 10:00:00", "purchase"),
      // u2: click BEFORE view -> level stops at 1
      (2L, "2024-01-02 10:00:00", "click"),
      (2L, "2024-01-03 10:00:00", "view"),
      // u3: purchase outside the 7-day window from first view
      (3L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-02 10:00:00", "click"),
      (3L, "2024-01-20 10:00:00", "purchase"),
      // u4: no view at all -> absent from the result
      (4L, "2024-01-01 10:00:00", "purchase"),
      // u5: greedy anchor — the EARLIEST view starts the clock, so the
      // later view cannot rescue the out-of-window purchase
      (5L, "2024-01-01 10:00:00", "view"),
      (5L, "2024-01-09 10:00:00", "view"),
      (5L, "2024-01-09 11:00:00", "click"),
      (5L, "2024-01-10 10:00:00", "purchase"))
    val got = Funnel.windowFunnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), "INTERVAL 7 DAY")
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 5L -> 1), got.toString)
  }

  test("markovTransitions: counts adjacent pairs per entity, rows sum to 1") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", "a"),
      (1L, "2024-01-01 11:00:00", "b"),
      (1L, "2024-01-01 12:00:00", "a"),
      (2L, "2024-01-01 10:00:00", "a"),
      (2L, "2024-01-01 11:00:00", "a"))
      .withColumn("event_id", monotonically_increasing_id())
    val got = Funnel.markovTransitions(df, "user_id", "ts", "event_type",
        "event_id")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // pairs: u1 a->b, b->a; u2 a->a. from 'a': {b:1, a:1}; from 'b': {a:1}
    assert(got == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "a") -> ((1L, 0.5)),
      ("b", "a") -> ((1L, 1.0))), got.toString)
  }

  test("olsTrend: exact fit on a perfectly linear series") {
    import graft.operators.TimeSeries
    // y = 3x + 2 for x in 0..4 under key g; r2 must be exactly 1
    val df = (0 to 4).map(x => ("g", x.toLong, 3L * x + 2)).toDF("g", "x", "y")
    val r = TimeSeries.olsTrend(df, Seq("g"), col("x"), col("y"))
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(r == (("g", 5L, 3.0, 2.0, 1.0)), r.toString)
  }

  test("cohortRetention: offsets computed from per-entity first day") {
    val df = ev(
      (1L, "2024-01-01 08:00:00", "view"),
      (1L, "2024-01-01 09:00:00", "click"),  // same day counts once
      (1L, "2024-01-09 08:00:00", "view"),   // offset 1 week
      (2L, "2024-01-02 08:00:00", "view"),   // same Mon-anchored cohort week
      (3L, "2024-01-10 08:00:00", "view"))   // next cohort week
    val got = Funnel.cohortRetention(df, "user_id", "ts")
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 2,   // u1 + u2 at offset 0
      ("2024-01-01", 1L) -> 1,   // u1 back in week 1
      ("2024-01-08", 0L) -> 1),  // u3's cohort
      got.toString)
  }
}
