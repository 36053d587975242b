package graft

import graft.operators.Windows
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: gap >= threshold starts a new session; gap < does not") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 11:29:59"), 2L), // 89:59 gap -> same session
      (1L, ts("2024-01-01 12:59:59"), 3L), // exactly 90:00 gap -> NEW session
      (2L, ts("2024-01-01 10:00:00"), 4L)
    ).toDF("user_id", "t", "event_id")
    val out = Windows.sessionize(df, Seq("user_id"), "t", Seq("event_id"), 90.0)
      .orderBy("event_id").select("session_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 1L, 2L, 1L))
  }

  test("runtimeMinutes: first row 0, negative clamped to 0") {
    val df = Seq(
      (1L, 1, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:31:00")),
      (1L, 2, ts("2024-01-01 10:20:00"), ts("2024-01-01 10:21:00")), // arrives before prev dep
      (1L, 3, ts("2024-01-01 10:51:00"), ts("2024-01-01 10:52:00"))
    ).toDF("trip", "seq", "arr", "dep")
    val out = Windows.runtimeMinutes(df, Seq("trip"), Seq("seq"), "arr", "dep")
      .orderBy("seq").select("runtime_min").as[Double].collect()
    assert(out.toSeq == Seq(0.0, 0.0, 30.0))
  }

  test("scaleWeightsToTotals: weighted total equals raw total per group") {
    val df = Seq(("g1", 2.0, 10.0), ("g1", 4.0, 30.0), ("g2", 1.0, 7.0))
      .toDF("g", "w", "t")
    val out = Windows.scaleWeightsToTotals(df, Seq("g"), "w", "t")
    val chk = out.groupBy("g")
      .agg(sum(col("weight_scaled") * col("t")).as("wt"), sum("t").as("rt"))
      .collect()
    chk.foreach(r => assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9))
  }

  test("imputeCarryForward chains through consecutive missing rows") {
    val df = Seq(
      ("k", 1, Some(10.0)), ("k", 2, None), ("k", 3, None), ("k", 4, Some(40.0))
    ).toDF("k", "m", "v")
    val out = Windows.imputeCarryForward(df, Seq("k"), Seq("m"),
        observed = col("v").isNotNull, valueCols = Seq("v"))
      .orderBy("m").select("v_imp").as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(10.0), Some(10.0), Some(10.0), Some(40.0)))
  }

  test("headway: minutes since previous, null first") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:07:30"), 2L)
    ).toDF("r", "t", "id")
    val out = Windows.headwayMinutes(df, Seq("r"), "t", Seq("id"))
      .orderBy("id").select("headway_min").collect()
    assert(out(0).isNullAt(0) && out(1).getDouble(0) == 7.5)
  }

  test("rollingZscore: flat series -> null z; spike flagged; exact hand math") {
    import spark.implicits._
    // key g: six 10s then a 20 — window 4: at the spike, frame =
    // (10,10,10,20): n=4, sx=50, sxx=700, var=(4*700-2500)/12=25, sd=5,
    // mean=12.5 -> z=(20-12.5)/5=1.5 (not anomalous at cutoff 2)
    val df = ((1 to 6).map(i => ("g", i, 10L)) :+ (("g", 7, 20L)))
      .toDF("g", "i", "y")
    val out = Windows.rollingZscore(df, Seq("g"), col("i"), col("y"),
        window = 4)
      .orderBy("i")
      .select(col("i"), col("z"), col("is_anomaly"))
      .collect()
    // rows 1-6: zero variance (or n<2) -> z null, flag false
    (0 until 6).foreach { r =>
      assert(out(r).isNullAt(1) && !out(r).getBoolean(2), s"row $r")
    }
    assert(math.abs(out(6).getDouble(1) - 1.5) < 1e-12, out(6).toString)
    assert(!out(6).getBoolean(2))
  }

  test("rollingZscore: genuine anomaly crosses the cutoff") {
    import spark.implicits._
    // noisy-but-small variance then a huge spike
    val ys = Seq(10L, 11L, 10L, 11L, 10L, 11L, 100L)
    val df = ys.zipWithIndex.map { case (y, i) => ("g", i, y) }
      .toDF("g", "i", "y")
    val out = Windows.rollingZscore(df, Seq("g"), col("i"), col("y"),
        window = 7)
      .orderBy("i").select("is_anomaly").as[Boolean].collect()
    assert(out.last, "spike must be flagged")
    assert(out.init.forall(!_), "pre-spike rows must not be flagged")
  }
}
