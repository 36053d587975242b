package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation — the Deequ / Great-Expectations-style
  * constraint suite a production table carries: row-level predicates,
  * key uniqueness, referential integrity. The reference pipelines
  * enforce these implicitly (QC column drops, expansion-join
  * preconditions); this makes the contract an EXPLICIT, auditable
  * artifact: one row per rule with exact violation counts.
  *
  * Scale shape: every row-level rule rides ONE shared aggregation pass
  * over the table (k rules = k conditional sums, map-side combinable —
  * adding a rule costs an expression, not a scan); each uniqueness
  * rule is one keyed groupBy; each foreign-key rule one left-anti
  * join (broadcast when the reference side is a dimension). Nothing
  * here collects or loops.
  */
object Contracts {

  /** Row-level predicate rule: `pred` must hold on every row. A null
    * predicate result (null participants) counts as a VIOLATION —
    * contracts are about guarantees, and "unknown" is not "held". */
  final case class RowRule(name: String, pred: Column)

  /** Key-uniqueness rule: `cols` must identify rows. Violations count
    * every row in a duplicated group (not just the extras) — the rows
    * an engineer must actually inspect. */
  final case class UniqueRule(name: String, cols: Seq[String])

  /** Referential-integrity rule: every (keys) tuple must appear in
    * `ref`(refKeys). Violations = orphan rows. Null keys are orphans
    * (they can't reference anything). */
  final case class FkRule(name: String, keys: Seq[String],
                          ref: DataFrame, refKeys: Seq[String])

  /** Run the suite. Returns one row per rule:
    * (rule, kind, n_checked, n_violations, pass), in suite order
    * within kind (row, unique, fk). */
  def validate(df: DataFrame, rowRules: Seq[RowRule] = Nil,
               uniqueRules: Seq[UniqueRule] = Nil,
               fkRules: Seq[FkRule] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty || fkRules.nonEmpty,
      "validate needs at least one rule")
    val shape = (rule: String, kind: String, n: Column, viol: Column) =>
      Seq(lit(rule).as("rule"), lit(kind).as("kind"),
        n.as("n_checked"), viol.as("n_violations"),
        (viol === 0).as("pass"))
    // all row rules in ONE pass: count(*) + one conditional sum each
    val rowFrames =
      if (rowRules.isEmpty) Nil
      else {
        val aggs = count(lit(1)).as("__n") +:
          rowRules.zipWithIndex.map { case (r, i) =>
            sum(when(coalesce(r.pred, lit(false)), 0L).otherwise(1L))
              .as(s"__v$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*).localCheckpoint()
        rowRules.zipWithIndex.map { case (r, i) =>
          one.select(shape(r.name, "row", coalesce(col("__n"), lit(0L)),
            coalesce(col(s"__v$i"), lit(0L))): _*)
        }
      }
    val uniqueFrames = uniqueRules.map { r =>
      df.groupBy(r.cols.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c")), lit(0L)).as("__n"),
          coalesce(sum(when(col("__c") > 1, col("__c")).otherwise(0L)),
            lit(0L)).as("__v"))
        .select(shape(r.name, "unique", col("__n"), col("__v")): _*)
    }
    val fkFrames = fkRules.map { r =>
      val tot = df.agg(count(lit(1)).as("__n"))
        .withColumn("__k", Guards.constKey(col("__n")))
      val orphans = df.select(r.keys.map(col): _*).join(
          r.ref.select(r.refKeys.zip(r.keys).map { case (rk, k) =>
            col(rk).as(k)
          }: _*).distinct(),
          r.keys, "left_anti")
        .agg(count(lit(1)).as("__v"))
        .withColumn("__k", Guards.constKey(col("__v")))
      orphans.join(broadcast(tot), "__k")
        .select(shape(r.name, "fk", col("__n"), col("__v")): _*)
    }
    (rowFrames ++ uniqueFrames ++ fkFrames).reduce(_ unionByName _)
  }
}
