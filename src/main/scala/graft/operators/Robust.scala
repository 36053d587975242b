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
}
