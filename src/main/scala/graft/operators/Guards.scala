package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Runtime contracts for deliberately single-partition window inputs.
  *
  * Several operators run windows over BOUNDED series — distinct months of
  * a store, annual anchors, a post-limit top-k — where "all rows in one
  * task" is the intended layout, not an accident. Two problems with
  * expressing that as a bare partition-less window: WindowExec emits a
  * scary (and legitimate, in general) performance warning, and nothing
  * stops a caller from feeding an unbounded frame into the same code path
  * and silently getting a single-task sort of the world.
  *
  * The contract here fixes both:
  *   - [[partitionCols]] partitions key-less series windows by a CONSTANT
  *     — execution is identical (one hash partition), but the plan now
  *     says "single partition, on purpose", the WindowExec warning
  *     disappears, and the plan canary can keep treating truly
  *     partition-less windows as errors;
  *   - [[bounded]] wraps a windowed column with a same-partition row-count
  *     check that raise_errors past `maxRows` — the "bounded by
  *     construction" comments become enforced, with no extra shuffle or
  *     job (the count rides the partition the window already occupies).
  */
object Guards {

  /** Generous default: far beyond any month/year/config series, far below
    * what one task can sort without spilling. */
  val DefaultMaxRows = 1000000L

  /** A constant-valued but NON-FOLDABLE partition key derived from a real
    * column: Catalyst folds a literal partition key (and even
    * `hash(col) * 0`, via zero-product simplification) clean out of the
    * window spec, silently restoring the partition-less window and its
    * WindowExec warning; `pmod(hash(col), 1)` is always 0 but has no
    * simplification rule, so it survives optimization while still routing
    * every row to the one declared partition. */
  def constKey(anchor: Column): Column = pmod(hash(anchor), lit(1))

  /** The natural keys, or — for a key-less series — one constant
    * partition anchored on `anchor` (typically the order column). */
  def partitionCols(keys: Seq[String], anchor: Column): Seq[Column] =
    if (keys.isEmpty) Seq(constKey(anchor)) else keys.map(col)

  /** Enforce the bound on a single-partition series column. `anchor` must
    * be the same column the window partition was anchored on, so the
    * count rides the same exchange. */
  def bounded(c: Column, anchor: Column, what: String,
      maxRows: Long = DefaultMaxRows): Column = {
    val n = count(lit(1)).over(Window.partitionBy(constKey(anchor)))
    when(n > maxRows, raise_error(concat(
      lit(s"[graft] bounded single-partition series '$what' exceeded $maxRows rows: "),
      n.cast("string")))).otherwise(c)
  }

  /** Guard only the key-less (single-partition) case; keyed windows
    * parallelize by the key and need no bound. */
  def guardIfGlobal(keys: Seq[String], c: Column, anchor: Column, what: String,
      maxRows: Long = DefaultMaxRows): Column =
    if (keys.nonEmpty) c else bounded(c, anchor, what, maxRows)
}
