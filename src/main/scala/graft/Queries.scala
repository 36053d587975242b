package graft

import graft.agg.{AggMethod, AggRule, RuleAgg}
import graft.functions.{Exprs, Text}
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The query catalog: one entry per operator family from SURVEY.md §2 plus
  * the training-data-pipeline extensions (dedup / similarity / text).
  * Each Q carries the Spark program and, where ANSI-SQL-expressible, the
  * DuckDB oracle producing the identical result (same column names — the
  * driver sorts columns by name before hashing).
  *
  * Determinism discipline (needed for hash-equality against the oracle):
  *  - floats rounded at output (r2/r4/r6) — sums associativity differs
  *    between engines at the last ulp;
  *  - every window order is total (tie-broken by a unique key);
  *  - first/last realized as min_by/max_by on an explicit order key.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {
  import Tables._

  private def rev: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ---------------------------------------------------------------- §2.5 agg
  /** A1-A17 core: the rule-driven aggregation engine on lineitem. */
  val q01RuleaggBasic = Q(
    "q01_ruleagg_basic",
    (s, d) => {
      val rules = Seq(
        AggRule("sum_qty", "l_quantity", AggMethod.Sum),
        AggRule("sum_price", "l_extendedprice", AggMethod.Sum),
        AggRule("avg_disc", "l_discount", AggMethod.Mean),
        AggRule("n_rows", "l_orderkey", AggMethod.Count),
        AggRule("n_parts", "l_partkey", AggMethod.CountDistinct),
        AggRule("n_tax_nonzero", "l_tax", AggMethod.CountNonZero))
      RuleAgg.aggregate(lineitem(s, d), Seq("l_returnflag", "l_linestatus"), rules)
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("sum_qty"), 2).as("sum_qty"),
          round(col("sum_price"), 2).as("sum_price"),
          round(col("avg_disc"), 6).as("avg_disc"),
          col("n_rows"), col("n_parts"), col("n_tax_nonzero"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_price,
      round(avg(l_discount), 6) AS avg_disc,
      count(*) AS n_rows,
      CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      CAST(count(*) FILTER (WHERE l_tax <> 0) AS BIGINT) AS n_tax_nonzero
      FROM lineitem GROUP BY 1, 2"""))

  /** wgtSum / wgtAvg / deterministic first-last (SFMuniDataAggregator.py
    * wgtAvg = sum(w*x)/sum(w), :1162-1165; first/last order-of-appearance). */
  val q02RuleaggWeighted = Q(
    "q02_ruleagg_weighted",
    (s, d) => {
      val li = lineitem(s, d)
        .withColumn("ordkey", col("l_orderkey") * 10 + col("l_linenumber"))
      val rules = Seq(
        AggRule("wavg_price", "l_extendedprice", AggMethod.WgtAvg),
        AggRule("wsum_price", "l_extendedprice", AggMethod.WgtSum),
        AggRule("first_ship", "l_shipdate", AggMethod.First),
        AggRule("last_ship", "l_shipdate", AggMethod.Last),
        AggRule("sum_w", "l_quantity", AggMethod.Sum))
      RuleAgg.aggregate(li, Seq("l_returnflag"), rules,
          weight = Some("l_quantity"), order = Some("ordkey"))
        .select(col("l_returnflag"),
          round(col("wavg_price"), 4).as("wavg_price"),
          round(col("wsum_price"), 2).as("wsum_price"),
          col("first_ship"), col("last_ship"),
          round(col("sum_w"), 2).as("sum_w"))
    },
    Some("""SELECT l_returnflag,
      round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price,
      round(sum(l_extendedprice * l_quantity), 2) AS wsum_price,
      (min(struct_pack(k := l_orderkey * 10 + l_linenumber, v := l_shipdate))).v AS first_ship,
      (max(struct_pack(k := l_orderkey * 10 + l_linenumber, v := l_shipdate))).v AS last_ship,
      round(sum(l_quantity), 2) AS sum_w
      FROM lineitem GROUP BY 1"""))

  // -------------------------------------------------------------- §2.4 joins
  /** J1/J3/J6 — 3-way dim⟕fact join with broadcast dimension + monthly
    * rollup (the GTFS⟕AVL expansion-join shape). */
  val q03Join3way = Q(
    "q03_join_3way",
    (s, d) => {
      val c = broadcast(customer(s, d))
      val o = orders(s, d)
      val li = lineitem(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"),
          date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(round(sum(rev), 2).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
    },
    Some("""SELECT c_mktsegment,
      date_trunc('month', o_orderdate) AS month,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
      count(*) AS n_rows
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2"""))

  /** J4 — interval join: equi key + time-range predicate
    * (route-equiv validity windows, SFMuniDataHelper.py:587). */
  val q04IntervalJoin = Q(
    "q04_interval_join",
    (s, d) => {
      val o = orders(s, d)
      Joins.intervalJoin(lineitem(s, d), o, Seq.empty,
          factTime = col("l_shipdate"),
          dimStart = col("o_orderdate"),
          dimEnd = col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          joinType = "inner", broadcastDim = false)
        .where(col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum(rev), 2).as("revenue"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate
      AND l_shipdate < o_orderdate + INTERVAL 90 DAY
      GROUP BY 1"""))

  /** As-of join (backward): latest order per user at event time — the
    * union-window technique, one shuffle, no join explosion. */
  val q05AsofJoin = Q(
    "q05_asof_join",
    (s, d) => {
      val pre = orders(s, d)
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("od"))
        .agg(max("o_orderkey").as("last_orderkey"),
          max("o_totalprice").as("last_price"))
      Joins.asOfJoinBackward(
          events(s, d).select("event_id", "user_id", "ts"),
          pre, keys = Seq("user_id"),
          leftTs = "ts", rightTs = "od",
          payloadCols = Seq("last_orderkey", "last_price"))
        .select("event_id", "user_id", "ts", "last_orderkey", "last_price")
    },
    Some("""WITH pre AS (
        SELECT o_custkey AS user_id, o_orderdate AS od,
               max(o_orderkey) AS last_orderkey, max(o_totalprice) AS last_price
        FROM orders GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, e.ts, p.last_orderkey, p.last_price
      FROM events e ASOF LEFT JOIN pre p
      ON e.user_id = p.user_id AND e.ts >= p.od"""))

  // ------------------------------------------------------------ §2.6 windows
  /** W1 — headway: minutes since previous event per user. */
  val q06Headway = Q(
    "q06_headway",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("headway_min",
          round((col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double")) / 60.0, 4))
        .select("event_id", "user_id", "headway_min")
    },
    Some("""SELECT event_id, user_id,
      round((epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) / 60.0, 4) AS headway_min
      FROM events"""))

  /** W4 — sessionization (90-min gap rule, ClipperHelper.py:209-246). */
  val q07Sessionize = Q(
    "q07_sessionize",
    (s, d) =>
      Windows.sessionize(events(s, d), Seq("user_id"), "ts", Seq("event_id"),
          gapMinutes = 90.0)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("start_ts"), max("ts").as("end_ts")),
    Some("""WITH s AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR (epoch(ts) - epoch(lag(ts) OVER w)) / 60.0 >= 90
               THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s2 AS (
        SELECT user_id, ts,
          CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM s)
      SELECT user_id, session_id, count(*) AS n_events,
             min(ts) AS start_ts, max(ts) AS end_ts
      FROM s2 GROUP BY 1, 2"""))

  /** W2 — observed runtime: max(0, t - lag(t)) along a sequence. */
  val q08Runtime = Q(
    "q08_runtime",
    (s, d) =>
      // (l_orderkey, l_linenumber) is NOT unique in the data — the order
      // must be total or lag() is engine-dependent.
      Windows.runtimeMinutes(lineitem(s, d), Seq("l_orderkey"),
          Seq("l_linenumber", "l_shipdate", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice"),
          "l_shipdate", "l_shipdate")
        .groupBy("l_returnflag")
        .agg(round(avg("runtime_min"), 4).as("avg_gap_min"),
          count(lit(1)).as("n")),
    Some("""WITH g AS (
        SELECT l_returnflag,
          CASE WHEN lag(l_shipdate) OVER w IS NULL THEN 0.0
               ELSE greatest(0.0, (epoch(l_shipdate) - epoch(lag(l_shipdate) OVER w)) / 60.0)
          END AS runtime_min
        FROM lineitem WINDOW w AS (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_shipdate, l_partkey, l_suppkey,
                   l_quantity, l_extendedprice))
      SELECT l_returnflag, round(avg(runtime_min), 4) AS avg_gap_min, count(*) AS n
      FROM g GROUP BY 1"""))

  /** W6 — running cumulative sum (cumulative load re-computation). */
  val q09Cumload = Q(
    "q09_cumload",
    (s, d) =>
      Windows.runningSum(events(s, d), Seq("user_id"), Seq("ts", "event_id"),
          col("value"), "cum_value")
        .groupBy("user_id")
        .agg(round(max("cum_value"), 4).as("max_cum"),
          round(avg("cum_value"), 4).as("avg_cum")),
    Some("""WITH c AS (
        SELECT user_id,
          sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS cum_value
        FROM events)
      SELECT user_id, round(max(cum_value), 4) AS max_cum,
             round(avg(cum_value), 4) AS avg_cum
      FROM c GROUP BY 1"""))

  /** W8 — expansion weighting: scale weights so weighted totals match raw
    * group totals (SFMuniDataExpander.py:122-166). Output shows the
    * invariant sum(w'*t) == sum(t). */
  val q10Weighting = Q(
    "q10_weighting",
    (s, d) =>
      Windows.scaleWeightsToTotals(
          lineitem(s, d).withColumn("w", lit(0.5) + col("l_discount")),
          Seq("l_returnflag", "l_linestatus"), "w", "l_quantity")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("weight_scaled") * col("l_quantity")), 2).as("weighted_total"),
          round(sum("l_quantity"), 2).as("raw_total"),
          round(avg("weight_scaled"), 6).as("avg_weight")),
    Some("""WITH g AS (
        SELECT l_returnflag, l_linestatus, l_quantity AS t,
          (0.5 + l_discount) AS w,
          sum(l_quantity) OVER (PARTITION BY l_returnflag, l_linestatus) AS st,
          sum((0.5 + l_discount) * l_quantity)
            OVER (PARTITION BY l_returnflag, l_linestatus) AS swt
        FROM lineitem)
      SELECT l_returnflag, l_linestatus,
        round(sum((w * (st / swt)) * t), 2) AS weighted_total,
        round(sum(t), 2) AS raw_total,
        round(avg(w * (st / swt)), 6) AS avg_weight
      FROM g GROUP BY 1, 2"""))

  /** All queries in catalog order. */
  def all: Seq[Q] = Seq(
    q01RuleaggBasic, q02RuleaggWeighted, q03Join3way, q04IntervalJoin,
    q05AsofJoin, q06Headway, q07Sessionize, q08Runtime, q09Cumload,
    q10Weighting)
}
