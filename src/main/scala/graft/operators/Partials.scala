package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregation via mergeable EXACT partials — the
  * materialized-view-maintenance pattern the mergeable-sketch family
  * (Sketches) applies to approximate state, here for exact counters:
  * each batch reduces to per-key (n, Σv, min, max, Σv²) state rows,
  * persisted once; any later rollup MERGES states (all five counters
  * are commutative monoids) without rescanning a byte of raw data.
  * A daily 100 TB ingest pays one scan per day forever, and month/
  * quarter/lifetime readouts are joins over kilobyte state tables.
  *
  * Float discipline: Σv and Σv² accumulate 9-dp-rounded decimals (the
  * chi-square/seasonal convention), so a merge of any batch partition
  * of the data yields bit-identical state — merge-invariance is exactly
  * decimal addition's associativity, spec-pinned in PartialsSpec.
  */
object Partials {

  private def dec(c: Column): Column = round(c, 9).cast("decimal(28,9)")

  /** One batch → per-key state rows (p_n, p_sum, p_min, p_max, p_sumsq). */
  def build(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("p_n"),
        sum(dec(valueCol)).as("p_sum"),
        min(valueCol).as("p_min"),
        max(valueCol).as("p_max"),
        sum(dec(valueCol * valueCol)).as("p_sumsq"))

  /** Merge any union of state tables back to one state row per key —
    * same schema in, same schema out (a monoid fold), so merges chain. */
  def merge(states: DataFrame, keys: Seq[String]): DataFrame =
    states.groupBy(keys.map(col): _*)
      .agg(sum("p_n").cast("long").as("p_n"),
        sum("p_sum").cast("decimal(28,9)").as("p_sum"),
        min("p_min").as("p_min"),
        max("p_max").as("p_max"),
        sum("p_sumsq").cast("decimal(28,9)").as("p_sumsq"))

  /** State → readout: n, sum, min, max, mean, population variance. */
  def finish(state: DataFrame, keys: Seq[String]): DataFrame = {
    val mean = col("p_sum").cast("double") / col("p_n")
    state.select(keys.map(col) ++ Seq(
      col("p_n").as("n"),
      round(col("p_sum").cast("double"), 6).as("sum_value"),
      col("p_min").as("min_value"),
      col("p_max").as("max_value"),
      round(mean, 6).as("mean"),
      round(greatest(
        col("p_sumsq").cast("double") / col("p_n") - mean * mean,
        lit(0.0)), 6).as("variance")): _*)
  }
}
