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

  // The save/set/restore below mutates SESSION-GLOBAL state, so two
  // threads interleaving it on one session can leave AQE disabled for
  // every later query (T1 saves true + sets false, T2 saves false,
  // T1 restores true, T2 restores false) — exactly the r09 32-core
  // contamination cluster (q182 pass-2 at a core-count-independent
  // 49 s = the measured AQE-off regression). A per-session reentrant
  // lock serializes the toggle-and-body regions: concurrent callers on
  // the SAME session (q181 builds branches on a thread pool, and two of
  // them reach wrapped trainer loops) now run their loop bodies one at
  // a time, while nested calls on one thread (e.g. a trainer inside a
  // wrapped composite) re-enter freely and restore correctly because
  // the inner save observes the outer set. Sessions are weakly keyed so
  // test-suite sessions don't accumulate.
  private val locks = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.locks.ReentrantLock])
  private def lockOf(spark: SparkSession) =
    locks.synchronized {
      var l = locks.get(spark)
      if (l == null) {
        l = new java.util.concurrent.locks.ReentrantLock
        locks.put(spark, l)
      }
      l
    }

  def withLoopPlanning[T](spark: SparkSession)(body: => T): T = {
    val lock = lockOf(spark)
    lock.lock()
    try {
      val saved = spark.conf.get(Key)
      spark.conf.set(Key, spark.conf.get(Override, "false"))
      try body finally spark.conf.set(Key, saved)
    } finally lock.unlock()
  }
}
