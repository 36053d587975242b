package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling / interpolation (SURVEY.md §2.9). The reference
  * leans on pandas `resample`/`interpolate`; here the spine is generated
  * with `explode(sequence(...))` and interpolation is two window passes —
  * all relational, all distributed.
  */
object TimeSeries {

  /** Month spine: one row per (key, month) for every month between the
    * global min and max of `monthCol`. Keys come from `keyDf` (distinct
    * key rows); the spine is a tiny exploded range cross-joined with keys,
    * so at scale the subsequent join against facts is the only shuffle.
    */
  def monthSpine(df: DataFrame, keys: Seq[String], monthCol: String): DataFrame = {
    val bounds = df.select(
      min(date_trunc("MONTH", col(monthCol))).as("lo"),
      max(date_trunc("MONTH", col(monthCol))).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 MONTH"))).as(monthCol))
    if (keys.isEmpty) spine
    else df.select(keys.map(col): _*).distinct().crossJoin(spine)
  }

  /** T4 — resample-asfreq: surface missing months as null rows
    * (TransitReporter.py:81-85). One row per key×month, values null where
    * no data existed. */
  def resampleMonthly(df: DataFrame, keys: Seq[String], monthCol: String): DataFrame =
    monthSpine(df, keys, monthCol).join(df, keys :+ monthCol, "left")

  /** T1/T2/T5 — linear interpolation by position along `orderCol` (an
    * integer position, e.g. months since epoch), per key
    * (DemandHelper.py:1559-1619). Interior nulls are linearly interpolated;
    * leading/trailing nulls are filled with the nearest anchor (flat
    * extrapolation; callers wanting the reference's linear end-extrapolation
    * prepend synthetic anchor rows).
    */
  def interpolateLinear(
      df: DataFrame, keys: Seq[String], orderCol: String, value: String,
      out: String): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val past = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = part.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(value)
    val t = col(orderCol).cast("double")
    val prevV = last(v, ignoreNulls = true).over(past)
    val prevT = last(when(v.isNotNull, t), ignoreNulls = true).over(past)
    val nextV = first(v, ignoreNulls = true).over(future)
    val nextT = first(when(v.isNotNull, t), ignoreNulls = true).over(future)
    val interp = prevV + (nextV - prevV) * (t - prevT) / (nextT - prevT)
    df.withColumn(out,
      coalesce(v,
        when(prevV.isNotNull && nextV.isNotNull, interp),
        prevV, nextV))
  }

  /** T3 — step-function forward fill (tolls/parking/fares resample-ffill,
    * DemandHelper.py:1444-1513). */
  def ffill(df: DataFrame, keys: Seq[String], orderCol: String,
            valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** T6-style anchored cumulative reconstruction: given per-period `net`
    * changes and one anchored absolute `anchorValue` at `anchorAt`, rebuild
    * the absolute series forward and backward from the anchor:
    * stock(t) = anchor + cumsum(net) - cumsum_at_anchor
    * (DemandHelper.py:923-933 does this with two iterative loops).
    */
  def reconstructFromAnchor(
      df: DataFrame, keys: Seq[String], orderCol: String, net: String,
      anchorAt: Column, anchorValue: Column, out: String): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val cum = sum(coalesce(col(net), lit(0.0)))
      .over(part.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val all = Window.partitionBy(keys.map(col): _*)
    val d = df.withColumn("__cum", cum)
    d.withColumn("__anchor_cum", max(when(anchorAt, col("__cum"))).over(all))
      .withColumn(out, anchorValue + col("__cum") - col("__anchor_cum"))
      .drop("__cum", "__anchor_cum")
  }
}
