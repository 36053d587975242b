package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot / unpivot / crosstab (SURVEY.md §2.7 O5/O6, §2.5 A17).
  */
object Reshape {

  /** O5 — pivot with an explicit value list. Always pass `colValues`:
    * without it Spark runs an extra distinct job AND the output column
    * set becomes data-dependent — both wrong for a production pipeline.
    */
  def pivot(df: DataFrame, rowKeys: Seq[String], pivotCol: String,
            colValues: Seq[String], agg: Column): DataFrame =
    df.groupBy(rowKeys.map(col): _*).pivot(pivotCol, colValues).agg(agg)

  /** A17 — cleanCrosstab (Utils.py:23-46): pivot plus a "Total" row and
    * column, zeros for empty cells. Realized as a single-pass rollup over
    * both axes: rollup(row, col) emits (row,col), (row,·) and (·,·)
    * subtotals; the row-axis "Total" needs the (·,col) margin, so we
    * aggregate from grouping sets via cube and keep the three margin
    * kinds the reference emits. One shuffle, no unions.
    */
  def crosstabWithTotals(df: DataFrame, rowKey: String, colKey: String,
                         value: Column, colValues: Seq[String],
                         totalLabel: String = "Total"): DataFrame = {
    // grouping() is only resolvable inside the cube's aggregate list
    val cubed = df.cube(col(rowKey), col(colKey))
      .agg(value.as("__v"),
        grouping(col(rowKey)).as("__gr"), grouping(col(colKey)).as("__gc"))
      .withColumn(rowKey, when(col("__gr") === 1, totalLabel).otherwise(col(rowKey)))
      .withColumn(colKey, when(col("__gc") === 1, totalLabel).otherwise(col(colKey)))
      .drop("__gr", "__gc")
    cubed.groupBy(rowKey).pivot(colKey, colValues :+ totalLabel)
      .agg(first(col("__v")))
      .na.fill(0.0)
  }

  /** O6 — melt wide measure columns to long (stack/unpivot;
    * DemandHelper.py:1541-1550 CPI wide-months -> long). */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
           varName: String = "variable", valueName: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valueName)

  /** Table diff / reconciliation — the data-regression audit every
    * pipeline migration runs ("same keys? same values?"): classify each
    * key as added (only in `after`), removed (only in `before`), changed
    * (both sides, any compared column differs — null-safe), or
    * unchanged. ONE full-outer key join; value comparison is the
    * null-safe equality of the two column structs, so nulls diff like
    * values and never leak 'changed' rows as 'unchanged'. Both sides
    * must be key-unique (enforce upstream — a duplicate key makes "the"
    * row ill-defined on either side).
    *
    * Returns (keys..., status); aggregate downstream for the audit
    * summary, or filter status != 'unchanged' for the delta feed.
    */
  def tableDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
                compare: Seq[String]): DataFrame = {
    val b = before.select((keys ++ compare).map(col): _*)
      .withColumn("__b", struct(compare.map(col): _*))
      .select((keys.map(col) :+ col("__b")): _*)
    val a = after.select((keys ++ compare).map(col): _*)
      .withColumn("__a", struct(compare.map(col): _*))
      .select((keys.map(col) :+ col("__a")): _*)
    b.join(a, keys, "full_outer")
      .withColumn("status",
        when(col("__b").isNull, lit("added"))
          .when(col("__a").isNull, lit("removed"))
          .when(col("__b") <=> col("__a"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select((keys.map(col) :+ col("status")): _*)
  }
}
