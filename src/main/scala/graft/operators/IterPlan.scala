package graft.operators

import org.apache.spark.sql.SparkSession

/** Static (non-adaptive) planning for loops whose per-round plan is
  * ALREADY the right one (r09; full A/B in OPTIMIZATION_r09.md).
  *
  * AQE does two things to an iterative round: it converts joins whose
  * materialized side turns out tiny into runtime broadcasts (a big WIN
  * for the default checkpointed-RDD graph rounds — forcing static plans
  * there quintupled round task time, so those loops DO NOT use this),
  * and it re-plans/re-materializes after every exchange (pure per-round
  * LATENCY when the plan cannot improve). Two loop families are in the
  * second camp and run under this wrapper:
  *  - rounds over a PREPARED bucketed edge table, where co-partitioning
  *    is statically known and the static plan is exactly the zero-
  *    exchange plan the layout bought (q232: 44 s with AQE → 16.5 s
  *    static; q179: 13 s → 4.6 s at sf0.1 local[32]);
  *  - collect-driven trainer rounds (Lloyd iterations, PQ codebook
  *    training) whose per-round query is one partial-aggregated scan
  *    with nothing for AQE to re-decide (q127: 8.2 s → 6.5 s).
  * Restores the session's AQE setting afterwards, so query-level plans
  * outside the loop are untouched. On a cluster where even these rounds
  * are skew-prone, `spark.graft.iterative.aqe=true` re-enables adaptive
  * rounds — the trade is documented where it is paid.
  */
object IterPlan {
  private val Key = "spark.sql.adaptive.enabled"
  private val Override = "spark.graft.iterative.aqe"

  def withLoopPlanning[T](spark: SparkSession)(body: => T): T = {
    val saved = spark.conf.get(Key)
    spark.conf.set(Key, spark.conf.get(Override, "false"))
    try body finally spark.conf.set(Key, saved)
  }
}
