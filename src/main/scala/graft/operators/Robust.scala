package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median-based) outlier statistics — the Hampel / MAD gate
  * (Iglewicz & Hoaglin 1993): a value is anomalous when its absolute
  * deviation from the group median exceeds `cutoff` robust standard
  * deviations (MAD * 1.4826, the normal-consistency constant). Unlike
  * mean/stddev gating, one wild sensor doesn't drag the threshold.
  *
  * Two grouped exact percentiles + two broadcast-sized joins (the
  * per-group stats frames are group-count scale). Exact `percentile`
  * is the gate-scale choice and rides q34's proven quantile_cont
  * parity; the 100 TB swap is `approx_percentile` or the bottom-k
  * sample sketch (Sketches.bottomKSample) — same structure, sketch
  * medians.
  */
object Robust {

  /** Per-group (med, mad, n, n_outliers). `valueCol` should be
    * pre-filtered of null/NaN by the caller (mirrors what the oracle
    * sees). */
  def madStats(df: DataFrame, keys: Seq[String], valueCol: Column,
               cutoff: Double = 3.0): DataFrame = {
    val med = df.groupBy(keys.map(col): _*)
      .agg(percentile(valueCol, lit(0.5)).as("med"))
    val dev = df.join(broadcast(med), keys)
      .withColumn("__ad", abs(valueCol - col("med")))
    val mad = dev.groupBy(keys.map(col): _*)
      .agg(percentile(col("__ad"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), keys)
      .groupBy(keys.map(col): _*)
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("__ad") > lit(cutoff) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Seasonal-baseline anomaly gate: each observation is compared to the
    * mean ± `cutoff`·σ of ITS OWN seasonal cell (the caller's key set —
    * typically entity × day-of-week × hour), the classic
    * calendar-profile monitor ("is this Tuesday-9am reading abnormal
    * for Tuesday 9am?"). Naive global gates flag every rush hour; the
    * seasonal cell absorbs the calendar.
    *
    * Moments come from ONE grouped pass of decimal-exact (Σv, Σv²)
    * partials (9-dp-rounded terms, the chi-square float discipline), so
    * mean/σ are identical doubles in any engine and at any partition
    * order; the per-cell stats frame is seasonal-cell-scale (bounded by
    * |keys| cardinality, not data) and broadcasts back onto the stream.
    * Population σ, floored at 0 against catastrophic cancellation.
    *
    * Returns the input plus (n, mu, sd, is_anomaly).
    */
  def seasonalAnomalies(df: DataFrame, keys: Seq[String], valueCol: Column,
                        cutoff: Double = 3.0): DataFrame =
    scoreAgainstProfile(df, seasonalProfile(df, keys, valueCol), keys,
      valueCol, cutoff)

  /** The trained half: per-cell (n, mu, sd) from one grouped pass of
    * decimal-exact partials. Persist this frame and hand it to
    * [[scoreAgainstProfile]] to gate a LIVE stream against yesterday's
    * profile — the production monitor shape (the profile is static; the
    * stream only pays a broadcast join per micro-batch). */
  def seasonalProfile(df: DataFrame, keys: Seq[String],
                      valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(round(valueCol, 9).cast("decimal(28,9)")).as("__s1"),
        sum(round(valueCol * valueCol, 9).cast("decimal(28,9)")).as("__s2"))
      .withColumn("mu", col("__s1").cast("double") / col("n"))
      .withColumn("sd", sqrt(greatest(
        col("__s2").cast("double") / col("n") - col("mu") * col("mu"),
        lit(0.0))))
      .select((keys.map(col) ++ Seq(col("n"), col("mu"), col("sd"))): _*)

  /** The scoring half — stateless per row given the profile, so it is
    * streaming-safe (stream-static broadcast join + map). Rows in cells
    * absent from the profile are dropped by the inner join: an unseen
    * cell has no baseline to judge against (surface them separately via
    * left_anti if "new cell" is itself the alert). */
  def scoreAgainstProfile(df: DataFrame, profile: DataFrame,
                          keys: Seq[String], valueCol: Column,
                          cutoff: Double = 3.0): DataFrame =
    df.join(broadcast(profile), keys)
      .withColumn("is_anomaly",
        abs(valueCol - col("mu")) > lit(cutoff) * col("sd"))

  /** Exact per-group WEIGHTED median — the survey-statistics location
    * estimator (each row counts `weightCol` times: passenger-weighted
    * load, quantity-weighted price): the smallest value whose
    * cumulative weight reaches half the group total, found by one
    * keyed cumulative window over a TOTAL order (valueCol, tieCols) +
    * one broadcast totals join. Weights are coerced to LONG via an
    * explicit half-up floor(w + 0.5) BEFORE the cast — Spark's
    * decimal→long cast truncates toward zero while DuckDB's CAST
    * rounds to nearest, so a bare cast silently diverges on any
    * non-integral weight column; floor(w + 0.5) is the identical IEEE
    * tree on both engines (oracles must mirror it, see q220). Negative
    * weights raise (a negative cumulative weight makes the threshold
    * pick meaningless); a zero-total group yields w_median = NULL
    * instead of masquerading as its first row's value. The cumulative
    * sums and the 2·cum ≥ total threshold are then integer-exact — no
    * float comparison anywhere, hence engine-exact. Keyed windows
    * are naturally parallel; for groups too large to sort at 100 TB
    * the swap is [[graft.operators.Sketches.weightedBottomK]] (same
    * contract, bounded error), this is the exact tier. Returns
    * (keys, n, w_total, w_median). */
  def weightedMedian(df: DataFrame, keys: Seq[String], valueCol: Column,
                     weightCol: Column, tieCols: Seq[Column]): DataFrame = {
    // the guard rides the weight expression itself so column pruning
    // can never optimize it away
    val wt = when(weightCol < 0, raise_error(concat(
        lit("weightedMedian: negative weight "), weightCol.cast("string")))
        .cast("long"))
      .otherwise(floor(weightCol.cast("double") + lit(0.5d)).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(valueCol +: tieCols: _*)
    val cum = df
      .withColumn("__wt", wt)
      .withColumn("__v", valueCol)
      .withColumn("__cw", sum(col("__wt")).over(w))
    val tot = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(wt).as("w_total"))
    cum.join(broadcast(tot), keys)
      .where(lit(2) * col("__cw") >= col("w_total"))
      .groupBy(keys.map(col): _*)
      .agg(min(struct(col("__cw").as("c"), col("__v").as("v")))
        .getField("v").as("__med"),
        first(col("n")).as("n"), first(col("w_total")).as("w_total"))
      .select((keys.map(col) ++
        Seq(col("n"), col("w_total"),
          when(col("w_total") === 0, lit(null))
            .otherwise(col("__med")).as("w_median"))): _*)
  }

  /** Per-group trimmed and winsorized means (Tukey's robust location
    * pair): rank rows by the TOTAL order (valueCol, tieCols), drop —
    * or clamp to the surviving boundary values — the lowest and
    * highest floor(n·trimPct/100) rows, then take the decimal-exact
    * mean. The trimmed mean ignores the tails outright; the winsorized
    * mean keeps their COUNT but at the boundary values, reconstructed
    * arithmetically as (Σ_kept + cut·(v_lo + v_hi)) / n so no second
    * pass touches the trimmed rows. Values ride the 6-dp decimal grid;
    * the final divisions use [[graft.functions.Exprs.pround]] (group
    * sizes are exactly the small denominators built-in round()
    * disagrees on). Returns (keys, n, n_cut, trimmed_mean,
    * winsorized_mean). */
  def trimmedStats(df: DataFrame, keys: Seq[String], valueCol: Column,
                   tieCols: Seq[Column], trimPct: Int = 10): DataFrame = {
    require(trimPct >= 0 && trimPct < 50, "trimPct must be in [0, 50)")
    import graft.functions.Exprs.pround
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(valueCol +: tieCols: _*)
    val ranked = df
      .withColumn("__v", round(valueCol, 6))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)))
      .withColumn("__cut", floor(col("__n") * trimPct / 100).cast("long"))
    val kept = ranked
      .where(col("__rn") > col("__cut") &&
        col("__rn") <= col("__n") - col("__cut"))
    kept.groupBy(keys.map(col): _*)
      .agg(first(col("__n")).as("n"), first(col("__cut")).as("n_cut"),
        count(lit(1)).as("__nk"),
        sum(col("__v").cast("decimal(28,6)")).as("__s"),
        min(col("__v")).as("__vlo"), max(col("__v")).as("__vhi"))
      .select((keys.map(col) ++ Seq(
        col("n"), col("n_cut"),
        pround(col("__s").cast("double") / col("__nk"), 6)
          .as("trimmed_mean"),
        pround((col("__s") +
          col("__vlo").cast("decimal(28,6)") * col("n_cut") +
          col("__vhi").cast("decimal(28,6)") * col("n_cut"))
          .cast("double") / col("n"), 6).as("winsorized_mean"))): _*)
  }

  /** Theil–Sen robust trend (Theil 1950, Sen 1968): slope = the median
    * of all pairwise slopes (y_j − y_i)/(x_j − x_i), intercept = the
    * median residual y − slope·x — the trend line one wild day cannot
    * drag, where OLS ([[TimeSeries.olsTrend]]) moves with every
    * outlier. Pair volume is O(points²) PER KEY — bounded by series
    * length (a calendar-scale quantity), never by row count, which is
    * what makes the exact estimator scale-safe. Medians are picked by
    * rank under a TOTAL order (slope, x_i, x_j), averaging the middle
    * two — both engines pick the same rows and average the same two
    * doubles, and the output rounds via pround. Returns (keys,
    * n_points, n_pairs, slope, intercept). */
  def theilSen(df: DataFrame, keys: Seq[String], xCol: Column,
               yCol: Column): DataFrame = {
    import graft.operators.Guards
    import graft.functions.Exprs.pround
    val base = df.select((keys.map(col) :+ xCol.cast("long").as("__x") :+
      yCol.cast("double").as("__y")): _*)
    val a = base.select((keys.map(col) :+ col("__x").as("__x1") :+
      col("__y").as("__y1")): _*)
    val b = base.select((keys.map(col) :+ col("__x").as("__x2") :+
      col("__y").as("__y2")): _*)
    val pairs = a.join(b, keys).where(col("__x1") < col("__x2"))
      .withColumn("__m",
        (col("__y2") - col("__y1")) / (col("__x2") - col("__x1"))
          .cast("double"))
    val wm = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__m"), col("__x1"), col("__x2"))
    // middle-two picks via floor((cnt+k)/2.0): Spark's `/` is always
    // double division, so a bare (cnt+1)/2 would be x.5 for even
    // counts and match NO row
    def medianOf(ranked: DataFrame, v: Column): DataFrame = ranked
      .where(col("__rn") ===
          floor((col("__cnt") + lit(1)) / lit(2.0)).cast("long") ||
        col("__rn") ===
          floor((col("__cnt") + lit(2)) / lit(2.0)).cast("long"))
      .groupBy(keys.map(col): _*)
      .agg((sum(v) / count(lit(1))).as("__med"),
        first(col("__cnt")).as("__cnt0"))
    val slope = medianOf(
      pairs.withColumn("__rn", row_number().over(wm))
        .withColumn("__cnt", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(keys.map(col): _*))),
      col("__m"))
      .select((keys.map(col) :+ col("__med").as("__slope") :+
        col("__cnt0").as("n_pairs")): _*)
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__b"), col("__x"))
    val resid = base.join(broadcast(slope), keys)
      .withColumn("__b", col("__y") - col("__slope") * col("__x"))
    val intercept = medianOf(
      resid.withColumn("__rn", row_number().over(wr))
        .withColumn("__cnt", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(keys.map(col): _*))),
      col("__b"))
    slope.join(intercept.select((keys.map(col) :+
        col("__med").as("__icpt") :+ col("__cnt0").as("n_points")): _*),
        keys)
      .select((keys.map(col) ++ Seq(col("n_points"), col("n_pairs"),
        pround(col("__slope"), 9).as("slope"),
        pround(col("__icpt"), 9).as("intercept"))): _*)
  }
}
