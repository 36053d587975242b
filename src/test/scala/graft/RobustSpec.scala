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

  test("seasonalAnomalies: spike flagged in its own cell, calm cell silent") {
    // cell A: 19 baseline readings + one 100-spike (z = 4.4 > 3);
    // cell B: constant -> sd = 0, nothing can trip the gate
    val rows = (1 to 19).map(_ => ("A", 10.0)) :+ (("A", 100.0)) :++
      (1 to 8).map(_ => ("B", 42.0))
    val out = Robust.seasonalAnomalies(rows.toDF("cell", "v"),
        Seq("cell"), col("v"))
      .select("cell", "v", "is_anomaly").as[(String, Double, Boolean)]
      .collect()
    assert(out.count(r => r._1 == "A" && r._3) == 1)
    assert(out.filter(r => r._1 == "A" && r._3).head._2 == 100.0)
    assert(out.filter(_._1 == "B").forall(!_._3))
    // the seasonal point: a GLOBAL mean/sd gate over A∪B would flag
    // B's 42s or miss A's spike depending on mix — per-cell never does
    val mu = out.filter(_._1 == "A").map(_._2).sum / 20
    assert(math.abs(mu - 14.5) < 1e-9)
  }

  test("weightedMedian: weight mass decides, not row count") {
    // (1 w1)(2 w1)(3 w10): half of 12 is reached only at v=3 — a plain
    // median would say 2
    val df = Seq(("g", 1.0, 1L, 1), ("g", 2.0, 1L, 2), ("g", 3.0, 10L, 3))
      .toDF("k", "v", "w", "id")
    val r = Robust.weightedMedian(df, Seq("k"), col("v"), col("w"),
      Seq(col("id"))).head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 12L &&
      r.getDouble(3) == 3.0)
    // even split picks the LOWER weighted median (2cw >= total at cw=1)
    val even = Seq(("g", 1.0, 1L, 1), ("g", 2.0, 1L, 2))
      .toDF("k", "v", "w", "id")
    assert(Robust.weightedMedian(even, Seq("k"), col("v"), col("w"),
      Seq(col("id"))).head().getDouble(3) == 1.0)
  }

  test("weightedMedian: weight coercion is half-up, guards fire") {
    // non-integral weights coerce via floor(w + 0.5) — 2.5 counts 3,
    // 0.4 counts 0 — NOT the engine cast (Spark truncates, DuckDB
    // rounds to nearest; a bare cast silently diverges cross-engine)
    val frac = Seq(("g", 1.0, 0.4, 1), ("g", 2.0, 2.5, 2))
      .toDF("k", "v", "w", "id")
    val r = Robust.weightedMedian(frac, Seq("k"), col("v"), col("w"),
      Seq(col("id"))).head()
    assert(r.getLong(2) == 3L && r.getDouble(3) == 2.0)
    // a zero-total group answers NULL, not its first row's value
    val zero = Seq(("g", 1.0, 0.0, 1), ("g", 2.0, 0.0, 2))
      .toDF("k", "v", "w", "id")
    assert(Robust.weightedMedian(zero, Seq("k"), col("v"), col("w"),
      Seq(col("id"))).head().isNullAt(3))
    // negative weights raise instead of poisoning the cumulative sums
    val neg = Seq(("g", 1.0, -1.0, 1)).toDF("k", "v", "w", "id")
    val ex = intercept[Exception] {
      Robust.weightedMedian(neg, Seq("k"), col("v"), col("w"),
        Seq(col("id"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("trimmedStats: tails dropped or clamped, hand-computed") {
    // 1..9 plus an outlier 100: cut = 1 per tail -> kept 2..9
    val df = ((1 to 9).map(_.toDouble) :+ 100.0).zipWithIndex
      .map { case (v, i) => ("g", v, i) }.toDF("k", "v", "id")
    val r = Robust.trimmedStats(df, Seq("k"), col("v"), Seq(col("id")),
      trimPct = 10).head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 1L)
    assert(r.getDouble(3) == 5.5, "trimmed mean of 2..9")
    assert(r.getDouble(4) == 5.5, "winsorized: (44 + 2 + 9)/10")
    // plain mean would be 14.5 — the outlier is fully neutralized
  }

  test("theilSen: exact line recovered, one wild point ignored") {
    val line = (0 to 4).map(x => ("g", x, 2.0 * x + 1))
    val withOutlier = line :+ (("g", 5, 500.0))
    val clean = Robust.theilSen(line.toDF("k", "x", "y"), Seq("k"),
      col("x"), col("y")).head()
    assert(clean.getDouble(3) == 2.0 && clean.getDouble(4) == 1.0)
    val r = Robust.theilSen(withOutlier.toDF("k", "x", "y"), Seq("k"),
      col("x"), col("y")).head()
    assert(r.getLong(1) == 6L && r.getLong(2) == 15L)
    assert(r.getDouble(3) == 2.0, "median slope ignores the outlier")
    assert(r.getDouble(4) == 1.0, "median residual ignores the outlier")
    // OLS on the same data would report slope ~60 — the robustness gap
  }
}
