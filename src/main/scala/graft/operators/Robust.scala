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
}
