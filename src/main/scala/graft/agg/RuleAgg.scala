package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation method vocabulary of the rule-driven aggregation engine.
  *
  * Re-expresses the reference's `aggregateTransitRecords` spec interpreter
  * (sfdata_wrangler/SFMuniDataAggregator.py:1018-1214): each spec row is
  * `[outfield, infield, method, maxlevel]` with method one of
  * first/last/min/max/sum/mean/count/wgtSum/wgtAvg plus the custom callables
  * countUnique (:1272-1277) and np.count_nonzero (:280).
  *
  * Every method maps to a built-in Catalyst aggregate — no UDAFs — so the
  * whole aggregation benefits from map-side partial aggregation and
  * whole-stage codegen, and scales to arbitrarily large groups.
  */
sealed abstract class AggMethod
object AggMethod {
  case object Sum           extends AggMethod
  case object Mean          extends AggMethod
  case object Min           extends AggMethod
  case object Max           extends AggMethod
  /** Deterministic order-of-appearance first/last: pandas groupby
    * first()/last() after a sort (SFMuniDataHelper.py:525) — realized as
    * min_by/max_by over an explicit order column, which is shuffle-safe
    * (Spark's bare first() is nondeterministic across partitions). */
  case object First         extends AggMethod
  case object Last          extends AggMethod
  case object Count         extends AggMethod
  /** countUnique custom callable -> countDistinct (exact). At 100 TB swap
    * for approx_count_distinct via `approxDistinct = true`. */
  case object CountDistinct extends AggMethod
  case object CountNonZero  extends AggMethod
  /** wgtSum: sum(w * x) (SFMuniDataAggregator.py:1113-1125,1149-1150). */
  case object WgtSum        extends AggMethod
  /** wgtAvg: sum(w * x) / sum(w) (SFMuniDataAggregator.py:1162-1165).
    * The numerator skips null-x rows (pandas skipna on the w*x sum) but the
    * denominator is the TOTAL weight of the group — the reference divides by
    * `aggregated[weight]`, the plain sum of w over every row. A group whose
    * total weight is 0 yields null (pandas would produce inf/NaN; ANSI Spark
    * would throw, so we guard). */
  case object WgtAvg        extends AggMethod
  /** meanTimes (SFMuniDataAggregator.py:1218-1254): the average of a
    * datetime column. The reference sums whole seconds per row (ordinal
    * days + h/m/s — sub-second truncation) and integer-divides by the
    * non-null count (Python-2 integer division end-to-end), returning
    * null for an all-null group. Both steps here are FLOOR division
    * (via pmod), not Spark's truncate-toward-zero `div`: the reference's
    * second counts are always positive (ordinal days run from year 1)
    * so it never distinguishes the two, but epoch-based arithmetic
    * meets negative values on pre-1970 timestamps, where floor is what
    * Python's // and DuckDB's // both do. Realized as built-in
    * aggregates over unix micros — no UDAF, map-side partials intact.
    * Second-sums stay well inside long range (~1.7e9 s/row × up to
    * ~5e9 rows per group). */
  case object MeanTime      extends AggMethod
  /** Escape hatch for one-off aggregate expressions. */
  final case class Custom(build: String => Column) extends AggMethod
}

/** One aggregation rule: `in` column aggregated by `method` into `out`.
  * `maxLevel` mirrors the reference's level filter
  * (SFMuniDataAggregator.py:1092-1101): the rule is active only when the
  * requested aggregation level <= maxLevel, so one rule table drives the
  * whole trip/route-stop/route/system cascade.
  */
final case class AggRule(
    out: String,
    in: String,
    method: AggMethod,
    maxLevel: Int = Int.MaxValue)

object RuleAgg {

  /** Build the Catalyst aggregate expression for one rule. */
  def exprFor(
      rule: AggRule,
      weight: Option[String],
      order: Option[String],
      approxDistinct: Boolean = false): Column = {
    import AggMethod._
    val c = col(rule.in)
    def w = col(weight.getOrElse(
      throw new IllegalArgumentException(s"rule ${rule.out}: weighted method needs a weight column")))
    def ord = col(order.getOrElse(
      throw new IllegalArgumentException(s"rule ${rule.out}: First/Last need an order column")))
    val e: Column = rule.method match {
      case Sum           => sum(c)
      case Mean          => avg(c)
      case Min           => min(c)
      case Max           => max(c)
      // min/max of struct(orderKey, value): lexicographic, so ties in the
      // order key fall through to the value — fully deterministic even when
      // the order key is not unique (min_by/max_by are not, under ties).
      // Null values are skipped (the struct is nulled out), matching pandas
      // GroupBy.first()/last() which return the first/last NON-NA value.
      case First         =>
        min(when(c.isNotNull, struct(ord.as("k"), c.as("v")))).getField("v")
      case Last          =>
        max(when(c.isNotNull, struct(ord.as("k"), c.as("v")))).getField("v")
      case Count         => count(lit(1))
      case CountDistinct => if (approxDistinct) approx_count_distinct(c) else countDistinct(c)
      case CountNonZero  => count_if(c =!= lit(0))
      case MeanTime      => {
        // floor(a/b) = (a - pmod(a, b)) div b: pmod is non-negative, so
        // the subtraction makes the division exact (truncate == floor)
        // cast-to-timestamp first: unix_micros rejects TIMESTAMP_NTZ, and
        // the cast is an identity no-op when the input is already TIMESTAMP
        // (UTC session ⇒ wall-clock-preserving for NTZ inputs too)
        val us = s"unix_micros(cast(`${rule.in}` as timestamp))"
        val rowSec = s"(($us - pmod($us, 1000000)) div 1000000)"
        val n = s"count(`${rule.in}`)"
        expr(s"timestamp_seconds((sum($rowSec) - pmod(sum($rowSec), $n)) div $n)")
      }
      case WgtSum        => sum(c * w)
      case WgtAvg        => { val tw = sum(w); when(tw =!= 0, sum(c * w) / tw) }
      case Custom(f)     => f(rule.in)
    }
    e.as(rule.out)
  }

  /** The engine: one `groupBy(keys).agg(...)` built from the rule table.
    *
    * @param level   aggregation level; rules with maxLevel < level are dropped
    *                (mirrors SFMuniDataAggregator.py:1092-1101)
    * @param weight  weight column for WgtSum/WgtAvg rules
    * @param order   order column making First/Last deterministic
    * @param approxDistinct use approx_count_distinct (the 100 TB path)
    */
  def aggregate(
      df: DataFrame,
      keys: Seq[String],
      rules: Seq[AggRule],
      level: Int = 0,
      weight: Option[String] = None,
      order: Option[String] = None,
      approxDistinct: Boolean = false): DataFrame = {
    val active = rules.filter(_.maxLevel >= level)
    require(active.nonEmpty, "no active rules at this level")
    val exprs = active.map(exprFor(_, weight, order, approxDistinct))
    df.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }
}
