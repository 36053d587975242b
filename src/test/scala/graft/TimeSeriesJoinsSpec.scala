package graft

import graft.operators.{Joins, TimeSeries}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TimeSeriesJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("interpolateLinear: interior linear, ends flat") {
    val df = Seq(
      ("k", 0, None: Option[Double]), ("k", 1, Some(10.0)), ("k", 2, None),
      ("k", 3, None), ("k", 4, Some(40.0)), ("k", 5, None)
    ).toDF("k", "i", "v")
    val out = TimeSeries.interpolateLinear(df, Seq("k"), "i", "v", "vi")
      .orderBy("i").select("vi").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 10.0, 20.0, 30.0, 40.0, 40.0))
  }

  test("annualToMonthly: July/census anchors, LINEAR end extrapolation, trim") {
    // years 2000..2002 with values 120, 240, 300: synthetic anchors are
    // 2*120-240 = 0 @ Jul 1999 and 2*300-240 = 360 @ Jul 2003
    val annual = Seq((2000, 120.0), (2001, 240.0), (2002, 300.0)).toDF("yr", "v")
    val out = TimeSeries.annualToMonthly(annual, Seq.empty, "yr", Seq("v"),
        censusYears = Seq(2001))
      .orderBy("month")
      .select(col("month").cast("string"), col("v"))
      .as[(String, Double)].collect().toSeq
    assert(out.length == 36 && out.head._1 == "2000-01-01" && out.last._1 == "2002-12-01")
    val byMonth = out.toMap
    // Jan 2000 sits 6/12 of the way from the synthetic 0 to the real 120:
    // flat-fill would say 120; the linear end extrapolation says 60
    assert(byMonth("2000-01-01") == 60.0)
    // census year: the 240 anchors at APRIL 2001, so Apr is exact and the
    // Jul-2000 -> Apr-2001 stretch is 9 equal steps of (240-120)/9
    assert(byMonth("2001-04-01") == 240.0)
    assert(math.abs(byMonth("2000-10-01") - (120.0 + 3 * 120.0 / 9)) < 1e-9)
    // trailing: Dec 2002 is 5/12 toward the synthetic 360
    assert(byMonth("2002-12-01") == 300.0 + 5 * 60.0 / 12)
  }

  test("ffill carries last non-null forward only") {
    val df = Seq(("k", 1, Some(1.0)), ("k", 2, None), ("k", 3, Some(3.0)), ("k", 4, None))
      .toDF("k", "i", "v")
    val out = TimeSeries.ffill(df, Seq("k"), "i", Seq("v"))
      .orderBy("i").select("v").as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(1.0), Some(1.0), Some(3.0), Some(3.0)))
  }

  test("monthSpine covers min..max inclusive") {
    val df = Seq(ts("2024-01-15 00:00:00"), ts("2024-04-02 00:00:00")).toDF("m")
    assert(TimeSeries.monthSpine(df, Seq.empty, "m").count() == 4)
  }

  test("reconstructFromAnchor rebuilds both directions from the anchor") {
    // net[i] added at month i; anchor: month 3 has absolute 100
    val df = Seq(("k", 1, 5.0), ("k", 2, 7.0), ("k", 3, 11.0), ("k", 4, 2.0))
      .toDF("k", "m", "net")
    val out = TimeSeries.reconstructFromAnchor(df, Seq("k"), "m", "net",
        anchorAt = col("m") === 3, anchorValue = lit(100.0), out = "stock")
      .orderBy("m").select("stock").as[Double].collect()
    // cum = 5,12,23,25; anchor_cum=23 -> stock = 100 + cum - 23
    assert(out.toSeq == Seq(82.0, 89.0, 100.0, 102.0))
  }

  test("asOfJoinBackward: inclusive at equal ts, null when no earlier row") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 09:00:00"), "e0"),
      (2L, ts("2024-01-01 10:00:00"), "e2")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0), // equal ts -> matches e1
      (1L, ts("2024-01-01 08:00:00"), 80.0),
      (3L, ts("2024-01-01 01:00:00"), 1.0)
    ).toDF("k", "rt", "payload")
    val out = Joins.asOfJoinBackward(left, right, Seq("k"), "t", "rt", Seq("payload"))
      .orderBy("tag").select("payload").collect()
    assert(out(0).getDouble(0) == 80.0)  // e0 at 09:00 -> 08:00 row
    assert(out(1).getDouble(0) == 100.0) // e1 at 10:00 -> inclusive equal ts
    assert(out(2).isNullAt(0))           // k=2 has no right rows
  }

  test("intervalJoin: start inclusive, end exclusive") {
    val fact = Seq((1L, ts("2024-01-10 00:00:00")), (2L, ts("2024-01-20 00:00:00")))
      .toDF("id", "t")
    val dim = Seq((ts("2024-01-10 00:00:00"), ts("2024-01-20 00:00:00"), "window1"))
      .toDF("s", "e", "label")
    val out = Joins.intervalJoin(fact, dim, Seq.empty, col("t"), col("s"), col("e"))
      .orderBy("id").select("label").collect()
    assert(out(0).getString(0) == "window1" && out(1).isNullAt(0))
  }

  test("intervalJoinBucketed == brute-force range join, incl. boundaries and negatives") {
    // intervals straddle bucket boundaries, overlap each other, sit at
    // negative positions, and include an empty one (end <= start)
    val dim = Seq(
      (-25L, 35L, "wide"), (0L, 10L, "low"), (9L, 11L, "straddle"),
      (30L, 30L, "empty"), (100L, 130L, "high")
    ).toDF("s", "e", "label")
    val fact = Seq(-26L, -25L, -1L, 0L, 9L, 10L, 29L, 34L, 35L, 99L, 100L, 129L, 130L)
      .toDF("pos")
    val got = Joins.intervalJoinBucketed(fact, dim, col("pos"), col("s"), col("e"), 10L)
      .select("pos", "label").as[(Long, String)].collect().toSeq.sorted
    val want = (for {
      p <- Seq(-26L, -25L, -1L, 0L, 9L, 10L, 29L, 34L, 35L, 99L, 100L, 129L, 130L)
      (s, e, l) <- Seq((-25L, 35L, "wide"), (0L, 10L, "low"), (9L, 11L, "straddle"),
        (30L, 30L, "empty"), (100L, 130L, "high"))
      if p >= s && p < e
    } yield (p, l)).sorted
    assert(got == want)
    // no duplicate (fact, interval) matches despite multi-bucket intervals
    assert(got.size == got.distinct.size)
  }

  test("ewma: hand recursion, singleton identity, per-key isolation") {
    // α = 0.5 on [10, 20, 30]: y = [10, 15, 22.5]
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
      ("b", 1, 7.0)).toDF("k", "t", "v")
    val got = TimeSeries.ewma(df, Seq("k"), "t", col("v"), alpha = 0.5)
      .select("k", "t", "ewma").as[(String, Int, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", 1)) == 10.0)
    assert(got(("a", 2)) == 15.0)
    assert(got(("a", 3)) == 22.5)
    assert(got(("b", 1)) == 7.0, "singleton series: ewma = the value")
    // α = 1 degenerates to the raw series
    val raw = TimeSeries.ewma(df, Seq("k"), "t", col("v"), alpha = 1.0)
      .select("k", "t", "ewma").as[(String, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(raw == Map(("a", 1) -> 10.0, ("a", 2) -> 20.0,
      ("a", 3) -> 30.0, ("b", 1) -> 7.0))
  }

  test("skewHybridJoin: planted hot key — same answer as the plain join") {
    // key "hot" carries 1000 fact rows; 20 cold keys carry 10 each
    val fact = ((1 to 1000).map(i => ("hot", i)) ++
      (for (k <- 1 to 20; i <- 1 to 10) yield (s"c$k", i))).toDF("k", "v")
    val dim = (Seq("hot") ++ (1 to 20).map(k => s"c$k") :+ "unmatched")
      .map(k => (k, s"attr_$k")).toDF("k", "a")
    val hybrid = Joins.skewHybridJoin(fact, dim, "k", hotThreshold = 100)
      .groupBy("k", "a").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .as[(String, String, Long, Long)].collect().toSet
    val plain = fact.join(dim, "k")
      .groupBy("k", "a").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(hybrid == plain && plain.size == 21)
    // the split really split: exactly one key crossed the threshold
    val hot = fact.groupBy("k").count().where(col("count") >= 100)
    assert(hot.count() == 1L)
  }

  test("timeWeightedAverage: holding durations weigh values; singletons drop") {
    import graft.operators.Windows
    def t(sec: Int) = Timestamp.valueOf(s"2024-01-01 00:00:${"%02d".format(sec)}")
    val df = Seq(
      (1L, t(0), 100L, 10.0), (1L, t(10), 101L, 20.0), (1L, t(40), 102L, 99.0),
      (2L, t(5), 200L, 7.0) // single reading: no interval, excluded
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Windows.timeWeightedAverage(df, Seq("user_id"), col("ts"),
        col("event_id"), col("value"))
      .as[(Long, Long, Double, Double)].collect().toMap2twa
    // (10·10 + 20·30) / 40 = 17.5 — the plain mean would read 43
    assert(got(1L) == ((2L, 40.0, 17.5)))
    assert(!got.contains(2L))
  }

  private implicit class TwaOps(rows: Array[(Long, Long, Double, Double)]) {
    def toMap2twa: Map[Long, (Long, Double, Double)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("skewHybridJoin: refuses a census too hot to broadcast") {
    val fact = (1 to 100).flatMap(k => (1 to 3).map(i => (s"k$k", i)))
      .toDF("k", "v")
    val dim = (1 to 100).map(k => (s"k$k", "a")).toDF("k", "a")
    intercept[IllegalArgumentException] {
      Joins.skewHybridJoin(fact, dim, "k", hotThreshold = 2, maxHotKeys = 10)
        .count()
    }
  }

  test("stlDecompose recovers a planted trend + zero-sum weekly pattern") {
    // y(t) = 100 + 2t + pat[t % 7], pat sums to 0 over any 7
    // consecutive days -> centered MA is exactly the linear trend,
    // per-phase means are exactly the pattern, remainder is exactly 0
    val pat = Seq(3L, -1L, 2L, -2L, 1L, -3L, 0L)
    val start = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 21).map { t =>
      ("s", java.sql.Date.valueOf(start.plusDays(t)),
        100L + 2 * t + pat(t % 7))
    }
    val out = TimeSeries.stlDecompose(
        rows.toDF("k", "day", "y"), "k", "day", "y", period = 7)
      .orderBy(col("day")).collect()
    assert(out.length == 21)
    out.zipWithIndex.foreach { case (r, t) =>
      assert(r.getLong(2) == 100L + 2 * t + pat(t % 7))
      if (t >= 3 && t <= 17) {
        assert(r.getDouble(3) == 100.0 + 2 * t, s"trend at t=$t")
        assert(r.getDouble(4) == pat(t % 7).toDouble, s"seasonal at t=$t")
        assert(r.getDouble(5) == 0.0, s"remainder at t=$t")
      } else {
        assert(r.isNullAt(3) && r.isNullAt(5), s"edge row t=$t")
        assert(r.getDouble(4) == pat(t % 7).toDouble,
          s"edge seasonal at t=$t")
      }
    }
  }
}
