package graft

import graft.operators.Robust
import org.apache.spark.sql.functions._

/** MAD outlier gate on a hand-checkable fixture. */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("madStats: planted wild value flagged; threshold robust to it") {
    // 9 values near 10 plus one wild 1000. med = 10; absolute
    // deviations = (0 x5, 1 x4, 990) -> mad = 0.5... hand-check:
    // values: 9,9,10,10,10,10,10,11,11,1000 -> med 10;
    // ads: 1,1,0,0,0,0,0,1,1,990 sorted -> 0,0,0,0,0,1,1,1,1,990;
    // quantile_cont(0.5) over 10 items = avg(5th,6th) = (0+1)/2 = 0.5.
    // cutoff = 3 * 1.4826 * 0.5 = 2.2239 -> only 990 exceeds.
    val df = Seq(9.0, 9.0, 10.0, 10.0, 10.0, 10.0, 10.0, 11.0, 11.0, 1000.0)
      .map(("g", _)).toDF("g", "v")
    val r = Robust.madStats(df, Seq("g"), col("v"))
      .as[(String, Double, Double, Long, Long)].collect().head
    assert(r == (("g", 10.0, 0.5, 10L, 1L)), r.toString)
    // a mean/stddev gate on the same data flags NOTHING (the wild value
    // inflates sd to ~313, z(1000) ~ 2.87 but z(everything else) < 0.4;
    // the point: MAD's threshold stays tight) — sanity-check MAD found it
    assert(r._5 == 1L)
  }

  test("madStats: clean group has zero outliers") {
    val df = (1 to 20).map(i => ("g", 10.0 + (i % 3))).toDF("g", "v")
    val r = Robust.madStats(df, Seq("g"), col("v"))
      .as[(String, Double, Double, Long, Long)].collect().head
    assert(r._5 == 0L, r.toString)
  }
}
