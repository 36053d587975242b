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
