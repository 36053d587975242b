package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an (entity, timestamp, type) stream —
  * the funnel / cohort primitives every product-analytics engine ships
  * (ClickHouse `windowFunnel`, Mixpanel/Amplitude-style retention
  * matrices), expressed as keyed joins and aggregations so they scale
  * with the entity key.
  */
object Funnel {

  /** Ordered funnel with a completion window: for each entity, the
    * deepest step reached where step i happens strictly AFTER step i-1
    * and the whole chain fits inside `windowExpr` (a SQL interval, e.g.
    * "INTERVAL 7 DAY") of step 1. Greedy first-match semantics — each
    * step anchors at its earliest qualifying occurrence — the
    * deterministic, engine-replayable variant of the windowFunnel
    * family (a maximal matching would need per-entity backtracking for
    * corner cases that don't change funnel COUNTS in practice).
    *
    * Every join and aggregation is keyed by the entity column: at
    * scale each funnel step is one co-partitionable equi-join +
    * bounded-output min aggregation, no windows over the raw stream.
    *
    * Returns (entity, level): level k = completed steps 1..k; entities
    * with no step-1 event are absent (callers needing level 0 left-join
    * the entity universe).
    */
  def windowFunnel(df: DataFrame, entityCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowExpr: String): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val ts = col(tsCol).cast("timestamp")
    var cur = df.where(col(typeCol) === steps.head)
      .groupBy(col(entityCol).as("entity"))
      .agg(min(ts).as("t1"))
    steps.indices.tail.foreach { i =>
      val si = df.where(col(typeCol) === steps(i))
        .select(col(entityCol).as("entity"), ts.as("tsi"))
      val ti = cur.join(si, Seq("entity"))
        .where(col("tsi") > col(s"t$i") &&
          col("tsi") <= col("t1") + expr(windowExpr))
        .groupBy(col("entity")).agg(min(col("tsi")).as(s"t${i + 1}"))
      cur = cur.join(ti, Seq("entity"), "left")
    }
    val level = steps.indices.tail.map(i =>
      when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1): Column)(_ + _)
    cur.select(col("entity"), level.as("level"))
  }

  /** Cohort retention matrix: entities grouped by the week of their
    * first activity; each cell counts entities from that cohort active
    * in week-offset k (distinct activity DAYS collapse first, so heavy
    * entities count once). Two keyed aggregations + one entity join —
    * the at-scale shape; no global windows. Returns
    * (cohort_week, week_offset, n_active). */
  def cohortRetention(df: DataFrame, entityCol: String, tsCol: String)
      : DataFrame = {
    val d = to_date(col(tsCol).cast("timestamp"))
    val first = df.groupBy(col(entityCol).as("entity"))
      .agg(min(d).as("cohort_date"))
    val active = df.select(col(entityCol).as("entity"), d.as("d")).distinct()
    active.join(first, Seq("entity"))
      .groupBy(date_trunc("week", col("cohort_date")).cast("date")
          .as("cohort_week"),
        floor(datediff(col("d"), col("cohort_date")) / 7).as("week_offset"))
      .agg(countDistinct(col("entity")).as("n_active"))
  }

  /** First-order Markov transition matrix over per-entity event
    * sequences: P(next event type | current) estimated from adjacent
    * pairs in each entity's timeline. One keyed window (parallel by
    * entity, total order tie-broken by `tieCol`) produces the adjacent
    * pairs; two bounded-output aggregations produce counts and row-
    * normalized probabilities — output is |types|² rows regardless of
    * stream size. The probability division is the only float op
    * (exact-long operands), so values match cross-engine bit-for-bit.
    * Returns (src_type, dst_type, n, p). */
  def markovTransitions(df: DataFrame, entityCol: String, tsCol: String,
                        typeCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol))
      .orderBy(col(tsCol).cast("timestamp"), col(tieCol))
    val pairs = df
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("src_type"), col(typeCol).as("dst_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("src_type"))
      .agg(sum(col("n")).as("tot"))
    pairs.join(totals, Seq("src_type"))
      .select(col("src_type"), col("dst_type"), col("n"),
        (col("n").cast("double") / col("tot").cast("double")).as("p"))
  }
}
