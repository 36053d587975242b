package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation — the 100 TB pattern behind q53's approx
  * aggregates: distinct counts over a petabyte corpus are computed as
  * per-partition/per-batch SKETCH PARTIALS (persisted as a binary column
  * in parquet), then merged later WITHOUT rescanning the data. Daily
  * batches write their sketches once; any cross-batch rollup (monthly
  * uniques, per-source overlap audits, dashboard totals) is a
  * sketch-union over kilobytes instead of a shuffle over terabytes.
  *
  * Built on Spark's Apache DataSketches HLL functions
  * (hll_sketch_agg / hll_union_agg / hll_sketch_estimate — public SQL
  * surface since 3.5). Sketch binaries are engine-defined, so this
  * surface is spec-verified against exact aggregates (SketchSpec) rather
  * than DuckDB-oracled, same exemption as q53.
  */
object Sketches {

  /** Per-group HLL sketch partials of `valueCol` distinct values.
    * `lgK` trades size for accuracy (12 -> ~1.6% RSE, 2^12 buckets). */
  def hllPartials(df: DataFrame, keys: Seq[String], valueCol: String,
                  lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sketch"))

  /** Merge persisted partials up to a coarser grain (drop keys) — the
    * no-rescan rollup. Pass Nil for the global estimate. */
  def hllMergeEstimate(partials: DataFrame, keys: Seq[String],
                       out: String = "distinct_est"): DataFrame = {
    val merged = hll_sketch_estimate(hll_union_agg(col("hll_sketch"))).as(out)
    if (keys.isEmpty) partials.agg(merged)
    else partials.groupBy(keys.map(col): _*).agg(merged)
  }

  /** Estimate straight from one group's sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)
}
