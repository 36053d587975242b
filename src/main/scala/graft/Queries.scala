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

  /** Exact money sum: per-row cast to decimal(18,6) (deterministic), exact
    * decimal aggregation (order-independent), one cast back to double.
    * Plain double sums differ between engines in the last ulp, which flips
    * the final cent at the rounding boundary once magnitudes reach ~1e8
    * (observed at sf0.1: 5/400 rows off by 0.01). SQL mirror:
    * CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE). */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** Exact revenue term: price and discount are true 2-decimal quantities,
    * so casting EACH to decimal before multiplying is boundary-safe and
    * the product is exact — casting the noisy double product
    * price*(1-disc) to decimal is NOT (its last-ulp noise straddles cast
    * boundaries; 1 in ~400 groups flipped a cent at sf0.1). SQL mirror:
    * CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2))). */
  private def revDec: Column =
    col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1.00).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))

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
      (min(CASE WHEN l_shipdate IS NOT NULL
        THEN struct_pack(k := l_orderkey * 10 + l_linenumber, v := l_shipdate) END)).v AS first_ship,
      (max(CASE WHEN l_shipdate IS NOT NULL
        THEN struct_pack(k := l_orderkey * 10 + l_linenumber, v := l_shipdate) END)).v AS last_ship,
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
        .agg(round(sum(revDec), 2).cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows"))
    },
    Some("""SELECT c_mktsegment,
      date_trunc('month', o_orderdate) AS month,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (1.00 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
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
    (s, d) =>
      Windows.headwayMinutes(events(s, d), Seq("user_id"), "ts", Seq("event_id"))
        .withColumn("headway_min", round(col("headway_min"), 4))
        .select("event_id", "user_id", "headway_min"),
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
      // value is a true 2-decimal quantity: decimal cums are exact and
      // order-independent. avg is NOT emitted — sum/count of 2-decimal
      // data lands exactly on .xxx25/.xxx75 rounding halves, where the
      // engines' double-rounding implementations systematically disagree.
      Windows.runningSum(events(s, d), Seq("user_id"), Seq("ts", "event_id"),
          col("value").cast("decimal(18,2)"), "cum_value")
        .groupBy("user_id")
        .agg(round(max("cum_value").cast("double"), 2).as("max_cum"),
          round(sum("cum_value").cast("double"), 2).as("sum_cum"),
          count(lit(1)).as("n")),
    Some("""WITH c AS (
        SELECT user_id,
          sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
            ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS cum_value
        FROM events)
      SELECT user_id, round(CAST(max(cum_value) AS DOUBLE), 2) AS max_cum,
             round(CAST(sum(cum_value) AS DOUBLE), 2) AS sum_cum,
             count(*) AS n
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

  // -------------------------------------------------------- §2.9 time series
  /** W9 + T4 — month spine + carry-forward imputation of missing months. */
  val q11Impute = Q(
    "q11_impute",
    (s, d) => {
      val monthly = orders(s, d)
        .groupBy((col("o_custkey") % 10).as("grp"),
          date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(round(dsum(col("o_totalprice")), 2).as("revenue"))
      val full = TimeSeries.resampleMonthly(monthly, Seq("grp"), "month")
      Windows.imputeCarryForward(full, Seq("grp"), Seq("month"),
          observed = col("revenue").isNotNull, valueCols = Seq("revenue"))
        .select(col("grp"), col("month"),
          col("revenue_imp").as("revenue_filled"), col("imputed"))
    },
    Some("""WITH monthly AS (
        SELECT o_custkey % 10 AS grp,
               date_trunc('month', o_orderdate) AS month,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
        FROM orders GROUP BY 1, 2),
      spine AS (
        SELECT g.grp, m.month
        FROM (SELECT DISTINCT grp FROM monthly) g
        CROSS JOIN (SELECT unnest(generate_series(
          (SELECT min(date_trunc('month', o_orderdate)) FROM orders),
          (SELECT max(date_trunc('month', o_orderdate)) FROM orders),
          INTERVAL 1 MONTH)) AS month) m),
      joined AS (
        SELECT s.grp, s.month, mo.revenue
        FROM spine s LEFT JOIN monthly mo USING (grp, month))
      SELECT grp, month,
        last_value(revenue IGNORE NULLS) OVER (PARTITION BY grp ORDER BY month
          ROWS UNBOUNDED PRECEDING) AS revenue_filled,
        CAST(CASE WHEN revenue IS NULL AND last_value(revenue IGNORE NULLS)
          OVER (PARTITION BY grp ORDER BY month ROWS UNBOUNDED PRECEDING)
          IS NOT NULL THEN 1 ELSE 0 END AS INT) AS imputed
      FROM joined"""))

  /** T1/T5 — linear interpolation over a month series with deterministic
    * knockout gaps (every 3rd month masked). */
  val q12Interp = Q(
    "q12_interp",
    (s, d) => {
      val monthly = orders(s, d)
        .groupBy(date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(round(dsum(col("o_totalprice")), 2).as("raw"))
        .withColumn("value", when(month(col("month")) % 3 === 1, lit(null)).otherwise(col("raw")))
        .withColumn("idx", year(col("month")) * 12 + month(col("month")))
      TimeSeries.interpolateLinear(monthly, Seq.empty, "idx", "value", "value_interp")
        .select(col("month"), round(col("value_interp"), 4).as("value_interp"))
    },
    Some("""WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS month,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS raw
        FROM orders GROUP BY 1),
      masked AS (
        SELECT month,
          CASE WHEN month(month) % 3 = 1 THEN NULL ELSE raw END AS value,
          year(month) * 12 + month(month) AS idx
        FROM monthly),
      w AS (
        SELECT month, value, CAST(idx AS DOUBLE) AS t,
          last_value(value IGNORE NULLS) OVER past AS pv,
          last_value(CASE WHEN value IS NOT NULL THEN CAST(idx AS DOUBLE) END IGNORE NULLS) OVER past AS pt,
          first_value(value IGNORE NULLS) OVER fut AS nv,
          first_value(CASE WHEN value IS NOT NULL THEN CAST(idx AS DOUBLE) END IGNORE NULLS) OVER fut AS nt
        FROM masked
        WINDOW past AS (ORDER BY idx ROWS UNBOUNDED PRECEDING),
               fut AS (ORDER BY idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT month, round(COALESCE(value,
        CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
             THEN pv + (nv - pv) * (t - pt) / (nt - pt) END,
        pv, nv), 4) AS value_interp
      FROM w"""))

  /** T3 — step-function forward fill over the month spine with
    * deterministic gaps. */
  val q13Ffill = Q(
    "q13_ffill",
    (s, d) => {
      val monthly = orders(s, d)
        .groupBy(col("o_orderpriority"),
          date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(round(max("o_totalprice"), 2).as("raw"))
        .withColumn("value",
          when((month(col("month")) + length(col("o_orderpriority"))) % 4 === 0, lit(null))
            .otherwise(col("raw")))
        .drop("raw")
      TimeSeries.ffill(monthly, Seq("o_orderpriority"), "month", Seq("value"))
        .select(col("o_orderpriority"), col("month"), col("value").as("value_filled"))
    },
    Some("""WITH monthly AS (
        SELECT o_orderpriority, date_trunc('month', o_orderdate) AS month,
          CASE WHEN (month(date_trunc('month', o_orderdate)) + length(o_orderpriority)) % 4 = 0
               THEN NULL ELSE round(max(o_totalprice), 2) END AS value
        FROM orders GROUP BY o_orderpriority, date_trunc('month', o_orderdate))
      SELECT o_orderpriority, month,
        last_value(value IGNORE NULLS) OVER (PARTITION BY o_orderpriority
          ORDER BY month ROWS UNBOUNDED PRECEDING) AS value_filled
      FROM monthly"""))

  // ----------------------------------------------------------- §2.7 reshape
  /** O5 — pivot with explicit value list. */
  val q14Pivot = Q(
    "q14_pivot",
    (s, d) =>
      Reshape.pivot(lineitem(s, d), Seq("l_returnflag"), "l_linestatus",
          Seq("F", "O"), round(sum("l_quantity"), 2))
        .na.fill(0.0, Seq("F", "O")),
    Some("""SELECT l_returnflag,
      COALESCE(round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2), 0) AS "F",
      COALESCE(round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2), 0) AS "O"
      FROM lineitem GROUP BY 1"""))

  /** O6 — melt wide measures to long. */
  val q15Melt = Q(
    "q15_melt",
    (s, d) => {
      val wide = lineitem(s, d).groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
      Reshape.melt(wide, Seq("l_returnflag"), Seq("sum_qty", "sum_price"),
        "measure", "value")
    },
    Some("""WITH wide AS (
        SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM wide"""))

  /** A17 — cleanCrosstab: pivot plus Total row and column (Utils.py:23-46),
    * via one cube pass. */
  val q16CrosstabTotals = Q(
    "q16_crosstab_totals",
    (s, d) =>
      Reshape.crosstabWithTotals(lineitem(s, d), "l_returnflag", "l_linestatus",
        count(lit(1)).cast("double"), Seq("F", "O")),
    Some("""WITH base AS (SELECT l_returnflag, l_linestatus FROM lineitem)
      SELECT l_returnflag,
        CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F",
        CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O",
        CAST(count(*) AS DOUBLE) AS "Total"
      FROM base GROUP BY 1
      UNION ALL
      SELECT 'Total',
        CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS DOUBLE),
        CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS DOUBLE),
        CAST(count(*) AS DOUBLE)
      FROM base"""))

  /** W10/O1 — deterministic top-k: rank on the rounded measure with a key
    * tie-break (unrounded float ranks are engine-dependent). */
  val q17Topk = Q(
    "q17_topk",
    (s, d) => {
      val byCust = orders(s, d).groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("revenue"))
      // top-k WITHOUT a global window: orderBy().limit() plans as
      // TakeOrderedAndProject — per-partition heaps merged on the driver,
      // no single-partition sort of all customers at any scale. The rank
      // window below runs over the k=10 surviving rows only.
      val top = byCust.orderBy(col("revenue").desc, col("o_custkey")).limit(10)
      val w = Window.partitionBy(Guards.constKey(col("o_custkey")))
        .orderBy(col("revenue").desc, col("o_custkey"))
      top.withColumn("rank",
        Guards.bounded(row_number().over(w), col("o_custkey"),
            "q17 post-limit rank", maxRows = 10)
          .cast("long"))
    },
    Some("""SELECT o_custkey, revenue, rank FROM (
        SELECT o_custkey, revenue,
          row_number() OVER (ORDER BY revenue DESC, o_custkey) AS rank
        FROM (SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
              FROM orders GROUP BY 1))
      WHERE rank <= 10"""))

  // ------------------------------------------------------ §2.8 scalar exprs
  /** E1 — service-day logic (3 am rule) on events. */
  val q18ServiceDay = Q(
    "q18_service_day",
    (s, d) =>
      events(s, d)
        .withColumn("service_date",
          Exprs.serviceDate(col("ts")).cast("timestamp"))
        .groupBy("service_date", "event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value")),
    Some("""SELECT CAST(CASE WHEN hour(ts) < 3 THEN CAST(ts AS DATE) - INTERVAL 1 DAY
               ELSE CAST(ts AS DATE) END AS TIMESTAMP) AS service_date,
        event_type, count(*) AS n, round(sum(value), 4) AS sum_value
      FROM events GROUP BY 1, 2"""))

  /** E10 — fiscal-year recode (Jul–Jun, labeled by ending year). */
  val q19Fiscal = Q(
    "q19_fiscal",
    (s, d) =>
      orders(s, d)
        .withColumn("fiscal_year", Exprs.fiscalYear(col("o_orderdate")).cast("long"))
        .groupBy("fiscal_year")
        .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n")),
    Some("""SELECT CAST(CASE WHEN month(o_orderdate) <= 6 THEN year(o_orderdate)
               ELSE year(o_orderdate) + 1 END AS BIGINT) AS fiscal_year,
        round(sum(o_totalprice), 2) AS revenue, count(*) AS n
      FROM orders GROUP BY 1"""))

  /** E11 — CPI deflation: join a deterministic CPI series keyed by month,
    * multiply by base/CPI. */
  val q20CpiDeflate = Q(
    "q20_cpi_deflate",
    (s, d) => {
      val monthly = orders(s, d)
        .groupBy(date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
      val withCpi = monthly.withColumn("cpi",
        lit(100.0) + lit(0.25) *
          (year(col("month")) * 12 + month(col("month")) - lit(1995 * 12 + 1)))
      withCpi.select(col("month"),
        round(col("revenue"), 2).as("revenue"),
        round(col("cpi"), 4).as("cpi"),
        round(col("revenue") * (lit(100.0) / col("cpi")), 2).as("revenue_2010usd"))
    },
    Some("""WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1),
      c AS (SELECT month, revenue,
        100.0 + 0.25 * (year(month) * 12 + month(month) - 23941) AS cpi
        FROM monthly)
      SELECT month, round(revenue, 2) AS revenue, round(cpi, 4) AS cpi,
        round(revenue * (100.0 / cpi), 2) AS revenue_2010usd
      FROM c"""))

  // --------------------------------------- training-data pipeline: text ops
  /** Exact dedup by md5 content fingerprint. */
  val q21DedupExact = Q(
    "q21_dedup_exact",
    (s, d) =>
      Dedup.exact(documents(s, d), "text", "doc_id"),
    Some("""SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        min(doc_id) AS keep_id, count(*) AS dup_count
      FROM documents GROUP BY 1"""))

  /** Language-ID by marker-token counting (n-gram heuristic in miniature). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "art" -> Seq("the", "a"),
    "db"  -> Seq("table", "scan", "row", "key"),
    "st"  -> Seq("stream", "batch", "window"))

  /** The marker-count argmax cascade shared by q22 and q104 — ONE
    * definition so the two catalog classifiers cannot drift. Operates on
    * tokenSetCounts output columns s0/s1/s2. */
  private def langFromScores: Column =
    when(col("s0") === 0 && col("s1") === 0 && col("s2") === 0, "und")
      .when(col("s0") >= col("s1") && col("s0") >= col("s2"), langMarkers(0)._1)
      .when(col("s1") >= col("s2"), langMarkers(1)._1)
      .otherwise(langMarkers(2)._1)

  val q22LangId = Q(
    "q22_langid",
    (s, d) => {
      val docs = documents(s, d)
      val scores = Text.tokenSetCounts(docs, "doc_id", "text",
        langMarkers.zipWithIndex.map { case ((_, words), i) => (s"s$i", words) })
      scores.join(docs.select(col("doc_id").as("id"), col("n_chars")), Seq("id"))
        .withColumn("lang_pred", langFromScores)
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("n_docs"), round(avg("n_chars"), 4).as("avg_chars"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, n_chars,
          string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents),
      scored AS (
        SELECT doc_id, n_chars,
          len(list_filter(t, x -> x IN ('the', 'a'))) AS s0,
          len(list_filter(t, x -> x IN ('table', 'scan', 'row', 'key'))) AS s1,
          len(list_filter(t, x -> x IN ('stream', 'batch', 'window'))) AS s2
        FROM toks),
      labeled AS (
        SELECT doc_id, n_chars,
          CASE WHEN s0 = 0 AND s1 = 0 AND s2 = 0 THEN 'und'
               WHEN s0 >= s1 AND s0 >= s2 THEN 'art'
               WHEN s1 >= s2 THEN 'db'
               ELSE 'st' END AS lang_pred
        FROM scored)
      SELECT lang_pred, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
      FROM labeled GROUP BY 1"""))

  /** Quality scoring: token count, punctuation ratio, stopword ratio,
    * composite score. */
  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "in")

  val q23Quality = Q(
    "q23_quality",
    (s, d) => {
      val docs = documents(s, d)
      val counts = Text.tokenSetCounts(docs, "doc_id", "text",
        Seq(("n_stop", stopwords)))
      val base = docs.select(col("doc_id").as("id"), col("text"))
        .withColumn("punct", Text.punctRatio(col("text")))
      counts.join(base, Seq("id"))
        .withColumn("stop_r",
          when(col("n_tokens") > 0, col("n_stop").cast("double") / col("n_tokens"))
            .otherwise(0.0))
        .select(col("id").as("doc_id"),
          col("n_tokens"),
          round(col("punct"), 6).as("punct_ratio"),
          round(col("stop_r"), 6).as("stop_ratio"),
          Text.qualityScoreFrom(length(col("text")), col("punct"), col("stop_r"))
            .as("quality"))
    },
    Some("""WITH t AS (
        SELECT doc_id, text,
          -- string_split_regex('', ' ') is [''], not [] — guard empty text
          CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
               THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
          END AS toks
        FROM documents),
      m AS (
        SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
          CASE WHEN length(text) > 0
            THEN CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / length(text)
            ELSE 0.0 END AS punct_ratio,
          CASE WHEN len(toks) > 0
            THEN CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'in'))) AS DOUBLE) / len(toks)
            ELSE 0.0 END AS stop_ratio
        FROM t)
      SELECT doc_id, n_tokens, round(punct_ratio, 6) AS punct_ratio,
        round(stop_ratio, 6) AS stop_ratio,
        round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
          * greatest(0.0, 1.0 - punct_ratio * 5.0)
          * least(stop_ratio * 5.0, 1.0), 6) AS quality
      FROM m"""))

  /** Token counting rolled up by source. */
  val q24Tokens = Q(
    "q24_tokens",
    (s, d) =>
      documents(s, d)
        .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long"))
        .groupBy("source")
        .agg(sum("n_tokens").as("total_tokens"),
          round(avg("n_tokens"), 4).as("avg_tokens"),
          count(lit(1)).as("n_docs")),
    Some("""WITH t AS (
        SELECT source,
          -- string_split_regex('', ' ') is [''], not [] — guard empty text
          CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = '' THEN 0
               ELSE len(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
          END AS n_tokens
        FROM documents)
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        round(avg(n_tokens), 4) AS avg_tokens, count(*) AS n_docs
      FROM t GROUP BY 1"""))

  /** Exact n-gram Jaccard near-dup pairs, blocked by normalized prefix
    * (planted near-dups share prefixes; suffixes differ). */
  val q25Jaccard = Q(
    "q25_jaccard_pairs",
    (s, d) => {
      val docs = documents(s, d)
        .withColumn("block", substring(Text.normalize(col("text")), 1, 16))
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "block", n = 3, threshold = 0.5)
        .select(col("id1").as("doc1"), col("id2").as("doc2"), col("jaccard"))
    },
    Some("""WITH t AS (
        SELECT doc_id,
          substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS block,
          string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        FROM documents),
      sh AS (
        SELECT doc_id, block,
          list_distinct(CASE WHEN len(toks) >= 3
            THEN list_transform(generate_series(1, len(toks) - 2),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            ELSE [] END) AS shingles
        FROM t)
      SELECT a.doc_id AS doc1, b.doc_id AS doc2,
        round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
      FROM sh a JOIN sh b ON a.block = b.block AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5"""))

  // ------------------------------------- training-data pipeline: similarity
  /** Brute-force cosine top-k (exact ANN baseline). */
  val q26Knn = Q(
    "q26_knn_bruteforce",
    (s, d) => {
      val emb = embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", "vec_id", k = 5)
    },
    Some("""SELECT p.vec_id AS probe_id, n.rank, n.neighbor_id, n.cos
      FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) p,
      LATERAL (
        SELECT c.vec_id AS neighbor_id,
          row_number() OVER (ORDER BY list_cosine_similarity(c.embedding::DOUBLE[],
            (SELECT embedding FROM embeddings e WHERE e.vec_id = p.vec_id)::DOUBLE[]) DESC, c.vec_id) AS rank,
          round(list_cosine_similarity(c.embedding::DOUBLE[],
            (SELECT embedding FROM embeddings e WHERE e.vec_id = p.vec_id)::DOUBLE[]), 6) AS cos
        FROM embeddings c WHERE c.vec_id <> p.vec_id
        ORDER BY rank LIMIT 5) n"""))

  /** MinHash-LSH near-dup candidates (scale path). The whole pipeline —
    * md5-derived shingle hash, the 32 universal-hash mins, 8x4 banding on
    * the slice itself, signature-agreement estimate — is deliberately
    * engine-portable, so the oracle replays it exactly in DuckDB with the
    * same (a, b) coefficients inlined. */
  val q27MinhashLsh = Q(
    "q27_minhash_lsh",
    (s, d) =>
      Dedup.minHashLshPairs(documents(s, d), "doc_id", "text",
        n = 3, numHashes = 32, numBands = 8, threshold = 0.5),
    Some(minhashPairsSql +
      """
      SELECT id1, id2,
        len(list_filter(range(1, 33), i -> m1[i] = m2[i])) / 32.0 AS est_jaccard
      FROM cand
      WHERE len(list_filter(range(1, 33), i -> m1[i] = m2[i])) / 32.0 >= 0.5"""))

  /** The MinHash-LSH candidate CTE chain, shared by q27, the
    * connected-components queries and the q201 composition (which runs
    * it over a FILTERED relation). Ends with `cand(id1, id2, m1, m2)`;
    * no leading WITH so callers can splice it into a larger chain. */
  private def minhashCtesFrom(rel: String): String = {
      val minAggs = Dedup.hashCoeffs(32).zipWithIndex.map { case ((a, b), i) =>
        s"min((h0 * $a + $b) % 2147483647) AS m$i"
      }.mkString(",\n          ")
      val mhArr = (0 until 32).map(i => s"m$i").mkString("[", ", ", "]")
      s"""t AS (
        SELECT doc_id,
          string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
        FROM $rel),
      sh AS (
        SELECT doc_id,
          list_distinct(CASE WHEN len(toks) >= 3
            THEN list_transform(generate_series(1, len(toks) - 2),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            ELSE [] END) AS shingles
        FROM t),
      g AS (SELECT doc_id, unnest(shingles) AS sg FROM sh),
      hs AS (
        SELECT doc_id,
          ('0x' || substr(md5('0:' || sg), 1, 15))::BIGINT % 2147483647 AS h0
        FROM g),
      sig0 AS (
        SELECT doc_id,
          $minAggs
        FROM hs GROUP BY doc_id),
      sig AS (SELECT doc_id, $mhArr AS mh FROM sig0),
      banded AS (
        SELECT doc_id, mh, bands.band,
          array_to_string(mh[bands.band * 4 + 1 : bands.band * 4 + 4], ',') AS bucket
        FROM sig, (SELECT unnest(range(0, 8)) AS band) bands),
      cand AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.mh AS m1, b.mh AS m2
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"""
  }

  private lazy val minhashPairsSql: String =
    "WITH RECURSIVE " + minhashCtesFrom("documents")

  /** The SimHash signature + 16-bit chunk-banding replay as DuckDB CTEs
    * (`t` normalized text → … → `cand` banded id1<id2 candidate pairs
    * with both signatures) — shared by the q28 oracle and the q208
    * edit-verified tier on top of it. */
  private lazy val simhashCandCtes: String = {
    val bitSums = (0 until 64).map { b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(",\n          ")
    val sigExpr = (0 until 64).map { b =>
      s"CASE WHEN s$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END"
    }.mkString("\n          + ")
    s"""t AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n
        FROM documents),
      tok AS (
        SELECT doc_id, unnest(string_split(n, ' ')) AS tk
        FROM t WHERE n IS NOT NULL AND len(n) > 0),
      th AS (
        SELECT doc_id, ('0x' || substr(md5('0:' || tk), 1, 15))::BIGINT AS h
        FROM tok),
      bs AS (
        SELECT doc_id,
          $bitSums
        FROM th GROUP BY doc_id),
      sig AS (
        SELECT doc_id,
          $sigExpr AS simhash
        FROM bs),
      ch AS (
        SELECT doc_id, simhash, cs.chunk,
          (simhash >> (cs.chunk * 16)) & 65535 AS key
        FROM sig, (SELECT unnest(range(0, 4)) AS chunk) cs),
      cand AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
          a.simhash AS h1, b.simhash AS h2
        FROM ch a JOIN ch b
          ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id)"""
  }

  /** SimHash near-dup candidates (chunk-banded hamming join). md5-derived
    * token hashes keep the 64 bit-majority sums engine-portable; the
    * oracle replays signature construction, 16-bit pigeonhole banding, and
    * the hamming verify in DuckDB. */
  val q28Simhash = Q(
    "q28_simhash",
    (s, d) =>
      Dedup.simHashPairs(documents(s, d), "doc_id", "text", maxHamming = 6),
    Some(s"""WITH $simhashCandCtes
      SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
      FROM cand WHERE bit_count(xor(h1, h2)) <= 6"""))

  /** DuckDB expression for the hyperplane sign bucket — the same plane
    * matrix `Similarity.planeWeights` ships to Spark as array literals,
    * printed with Double.toString (shortest round-trip, exact on parse). */
  private def duckBucketExpr(planes: Int, dims: Int, vecExpr: String): String = {
    val w = Similarity.planeWeights(planes, dims)
    (0 until planes).map { p =>
      val lit = w(p).mkString("[", ", ", "]::DOUBLE[]")
      s"(CASE WHEN list_inner_product($vecExpr, $lit) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n          + ")
  }

  /** LSH-bucketed approximate top-k (the 100 TB ANN path): hyperplane sign
    * buckets as the coarse quantizer, probe's own bucket searched. The
    * plane matrix is a driver-side literal (see Similarity.planeWeights),
    * so the oracle computes identical buckets in DuckDB. */
  val q29AnnLsh = Q(
    "q29_ann_lsh",
    (s, d) => {
      val emb = embeddings(s, d)
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", "vec_id", k = 5, planes = 4, dims = 64)
    },
    Some {
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      b AS (
        SELECT vec_id, e,
          ${duckBucketExpr(4, 64, "e")} AS bucket
        FROM v),
      pr AS (SELECT vec_id AS probe_id, e AS pe, bucket FROM b WHERE vec_id < 10),
      sc AS (
        SELECT pr.probe_id, c.vec_id AS neighbor_id,
          list_cosine_similarity(c.e, pr.pe) AS cosf
        FROM b c JOIN pr ON c.bucket = pr.bucket AND c.vec_id <> pr.probe_id),
      rk AS (
        SELECT probe_id, neighbor_id, cosf,
          row_number() OVER (PARTITION BY probe_id ORDER BY cosf DESC, neighbor_id) AS rank
        FROM sc)
      SELECT probe_id, rank, neighbor_id, round(cosf, 6) AS cos
      FROM rk WHERE rank <= 5"""
    })

  // ------------------------------------------------- §2.6 W5 + §2.7 + §2.1
  /** W5 — taxi-style trip segmentation: a new trip starts on a long gap OR
    * a status-change event (2 of the reference's 5 break predicates,
    * TaxiDataHelper.py:203-309); trip id = running count of breaks. */
  val q30TripSegmentation = Q(
    "q30_trip_segmentation",
    (s, d) =>
      Windows.sessionize(events(s, d), Seq("user_id"), "ts", Seq("event_id"),
          gapMinutes = 60.0, sessionCol = "trip_id",
          breakWhen = Some(col("event_type") === "signup"))
        .groupBy("user_id", "trip_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("start_ts"), max("ts").as("end_ts"),
          round(sum("value"), 4).as("sum_value")),
    Some("""WITH g AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) >= 3600
                 OR event_type = 'signup'
               THEN 1 ELSE 0 END AS is_break
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (
        SELECT user_id, ts, value,
          CAST(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS trip_id
        FROM g)
      SELECT user_id, trip_id, count(*) AS n_events,
        min(ts) AS start_ts, max(ts) AS end_ts,
        round(sum(value), 4) AS sum_value
      FROM t GROUP BY 1, 2"""))

  /** A15 — groupby-transform broadcast back: per-row share of its group
    * total (ClipperHelper.py:250-252's transform(sum) pattern). */
  val q31TransformWindow = Q(
    "q31_transform_window",
    (s, d) => {
      val g = Window.partitionBy(col("user_id"), col("event_type"))
      events(s, d)
        .withColumn("n_type_events", count(lit(1)).over(g))
        .withColumn("value_share", round(col("value") /
          sum(col("value").cast("decimal(18,6)")).over(g).cast("double"), 6))
        .select("event_id", "user_id", "event_type", "n_type_events", "value_share")
    },
    Some("""SELECT event_id, user_id, event_type,
        count(*) OVER (PARTITION BY user_id, event_type) AS n_type_events,
        round(value / CAST(sum(CAST(value AS DECIMAL(18,6)))
          OVER (PARTITION BY user_id, event_type) AS DOUBLE), 6) AS value_share
      FROM events"""))

  /** Left-anti join — missing-dimension-member audit
    * (SFMuniDataHelper.py:593-596). */
  val q32LeftAnti = Q(
    "q32_leftanti",
    (s, d) =>
      Joins.missingKeys(
        customer(s, d).select(col("c_custkey")),
        orders(s, d).select(col("o_custkey").as("c_custkey")), "c_custkey"),
    Some("""SELECT DISTINCT c_custkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  /** O2 — unionByName of two monthly measure series into one long table. */
  val q33UnionSeries = Q(
    "q33_union_series",
    (s, d) => {
      val a = orders(s, d)
        .groupBy(date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(round(dsum(col("o_totalprice")), 2).as("value"))
        .withColumn("measure", lit("orders_rev"))
      val b = lineitem(s, d)
        .groupBy(date_trunc("MONTH", col("l_shipdate")).as("month"))
        .agg(round(sum(revDec), 2).cast("double").as("value"))
        .withColumn("measure", lit("lineitem_rev"))
      a.unionByName(b)
    },
    Some("""SELECT date_trunc('month', o_orderdate) AS month,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS value,
        'orders_rev' AS measure
      FROM orders GROUP BY 1
      UNION ALL
      SELECT date_trunc('month', l_shipdate) AS month,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1.00 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS value,
        'lineitem_rev' AS measure
      FROM lineitem GROUP BY 1"""))

  /** A10 — exact interpolated percentiles (taxi link p95,
    * TaxiDataHelper.py:50-54). At 100 TB use approx_percentile. */
  val q34Percentile = Q(
    "q34_percentile",
    (s, d) =>
      lineitem(s, d).groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
          round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"),
          count(lit(1)).as("n")),
    Some("""SELECT l_returnflag,
        round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
        count(*) AS n
      FROM lineitem GROUP BY 1"""))

  /** S1 — fixed-width source round-trip: lineitem formatted to a
    * fixed-width text file, read back through the colspec reader, then
    * aggregated; the oracle reads the original parquet — equality proves
    * the parse. */
  val q35FixedWidth = Q(
    "q35_fixedwidth",
    (s, d) => {
      import graft.sources.FixedWidth
      import graft.sources.FixedWidth.ColSpec
      import org.apache.spark.sql.types._
      val specs = Seq(
        ColSpec("l_orderkey", 1, 12, LongType),
        ColSpec("l_linenumber", 13, 4, IntegerType),
        ColSpec("l_returnflag", 17, 2, StringType),
        ColSpec("l_quantity", 19, 10, DoubleType),
        ColSpec("l_extendedprice", 29, 14, DoubleType))
      val tag = d.replaceAll(".*/", "")
      val path = graft.sources.Scratch.dir(s"fwf_$tag")
      lineitem(s, d)
        .select(FixedWidth.formatLine(specs).as("value"))
        .write.mode("overwrite").text(path)
      FixedWidth.read(s, path, specs)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
    },
    Some("""SELECT l_returnflag, count(*) AS n,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem GROUP BY 1"""))

  // ------------------------------------------ §2.10 graph/spatial + multimodal
  /** G1 — exact grid-blocked nearest neighbor: nearest customer point for
    * every supplier point (grid join + brute fallback keeps it exact). */
  val q36GridNn = Q(
    "q36_grid_nn",
    (s, d) => {
      val probes = supplier(s, d).select(col("s_suppkey").as("pid"),
        col("s_acctbal").as("x"), (col("s_nationkey") * 500.0).as("y"))
      val points = customer(s, d).select(col("c_custkey").as("qid"),
        col("c_acctbal").as("x"), (col("c_nationkey") * 500.0).as("y"))
      Spatial.nearest(probes, "pid", points, "qid", "x", "y", cellSize = 500.0)
        .select(col("probe_id"), col("point_id"), round(col("dist"), 4).as("dist"))
    },
    Some("""SELECT s.s_suppkey AS probe_id, n.point_id, n.dist
      FROM supplier s, LATERAL (
        SELECT c_custkey AS point_id,
          round(sqrt(power(c_acctbal - s.s_acctbal, 2)
            + power(c_nationkey * 500.0 - s.s_nationkey * 500.0, 2)), 4) AS dist
        FROM customer
        ORDER BY sqrt(power(c_acctbal - s.s_acctbal, 2)
            + power(c_nationkey * 500.0 - s.s_nationkey * 500.0, 2)), c_custkey
        LIMIT 1) n"""))

  /** G2 — all-pairs hop counts on a nation chain graph via iterative
    * frontier joins (the distributed shortest-path regime; the dense
    * driver-side skim lives in graph.Graph.floydWarshall). */
  val q37BfsHops = Q(
    "q37_bfs_hops",
    (s, d) => {
      val w = Window.partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
      val edges = nation(s, d)
        .withColumn("dst", lead(col("n_nationkey"), 1).over(w))
        .where(col("dst").isNotNull)
        .select(col("n_nationkey").as("src"), col("dst"))
      graft.graph.Graph.bfsHops(edges, maxHops = 10)
        .select(col("src").cast("int").as("src"), col("dst").cast("int").as("dst"),
          col("hops"))
    },
    Some("""WITH RECURSIVE e AS (
        SELECT n_nationkey AS src,
          lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        FROM nation),
      e2 AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
      walk AS (
        SELECT src, dst, 1 AS hops FROM e2
        UNION ALL
        SELECT w.src, e2.dst, w.hops + 1 FROM walk w JOIN e2 ON w.dst = e2.src
        WHERE w.hops < 10)
      SELECT src, dst, CAST(min(hops) AS BIGINT) AS hops
      FROM walk GROUP BY 1, 2"""))

  /** Multimodal metadata over an opaque binary column (decode stubbed;
    * schema/bytes plumbing real). */
  val q38BinaryMeta = Q(
    "q38_binary_meta",
    (s, d) =>
      documents(s, d)
        .withColumn("bytes", encode(col("text"), "UTF-8"))
        .select(col("doc_id"),
          length(col("bytes")).cast("long").as("n_bytes"),
          substring(upper(hex(col("bytes"))), 1, 16).as("head_hex")),
    Some("""SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        substring(upper(hex(encode(text))), 1, 16) AS head_hex
      FROM documents"""))

  /** Multimodal batched feature extraction through the stubbed decoder
    * (mapPartitions Dataset plumbing). The stub's byte-level features
    * (length, first byte, mod-997 byte-sum checksum) are themselves
    * deterministic functions of the UTF-8 bytes, so the oracle recomputes
    * them in DuckDB from the hex of the encoded blob — the decode STAYS a
    * stub, but the plumbing around it gets a real hash-equality gate. */
  val q39MultimodalFeatures = Q(
    "q39_multimodal_features",
    (s, d) => {
      val blobs = graft.multimodal.Binary.documentBlobs(documents(s, d), "doc_id", "text")
      graft.multimodal.Binary.extractFeatures(blobs)
        .toDF()
        .select(col("id"), col("n_bytes"), col("first_byte"), col("checksum"))
    },
    Some("""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
      SELECT doc_id AS id,
        CAST(len(hx) // 2 AS INT) AS n_bytes,
        CASE WHEN len(hx) = 0 THEN -1
             ELSE ('0x' || substr(hx, 1, 2))::INT END AS first_byte,
        CAST(COALESCE(list_sum(list_transform(range(0, len(hx) // 2),
            i -> ('0x' || substr(hx, 2 * i + 1, 2))::BIGINT)), 0) % 997
          AS BIGINT) AS checksum
      FROM b"""))

  /** G4 — Viterbi decoding per entity via mapGroups: 2-state HMM regime
    * decoding (low mu=25 / high mu=75, |obs-mu| emission cost, switch cost
    * 10) — the same DP kernel that map-matches taxi GPS traces in the
    * reference (Trajectory.py:37-97); the integrated map-matching pipeline
    * is q69. The planted series are small enough that each minimum-cost
    * path is derivable by hand (documented per user below); the oracle
    * inlines the hand-derived counts as VALUES — the q48/q49 golden
    * pattern. */
  val q40Viterbi = Q(
    "q40_viterbi",
    (s, d) => {
      import s.implicits._
      // (user_id, seq, value); hand-derived optimal paths (L=state0 mu 25,
      // H=state1 mu 75; costs in parentheses beat the best alternative):
      //   u1 20,30,25,70,80,75 -> LLLHHH (30)  1 switch
      //   u2 25,26,24,23,27    -> LLLLL  (7)   0
      //   u3 25,75,25          -> LHL    (20; stay-L costs 50)   2
      //   u4 25,50,25          -> LLL    (25; LHL costs 45)      0
      //   u5 80,70,75,76       -> HHHH   (11)  0
      //   u6 10,90,10,90,10    -> LHLHL  (115; emission dominates) 4
      val obs: Seq[(Long, Int, Double)] = Seq(
        (1L, 0, 20.0), (1L, 1, 30.0), (1L, 2, 25.0),
        (1L, 3, 70.0), (1L, 4, 80.0), (1L, 5, 75.0),
        (2L, 0, 25.0), (2L, 1, 26.0), (2L, 2, 24.0), (2L, 3, 23.0), (2L, 4, 27.0),
        (3L, 0, 25.0), (3L, 1, 75.0), (3L, 2, 25.0),
        (4L, 0, 25.0), (4L, 1, 50.0), (4L, 2, 25.0),
        (5L, 0, 80.0), (5L, 1, 70.0), (5L, 2, 75.0), (5L, 3, 76.0),
        (6L, 0, 10.0), (6L, 1, 90.0), (6L, 2, 10.0), (6L, 3, 90.0), (6L, 4, 10.0))
      val ev = obs.toDF("user_id", "seq", "value").as[(Long, Int, Double)]
      ev.groupByKey(_._1)
        .mapGroups { (uid, it) =>
          val o = it.toArray.sortBy(_._2).map(_._3)
          val mus = Array(25.0, 75.0)
          val path = graft.graph.Viterbi.decode(o.length, 2,
            emit = (t, st) => math.abs(o(t) - mus(st)),
            trans = (a, b) => if (a == b) 0.0 else 10.0)
          val switches = path.indices.drop(1).count(i => path(i) != path(i - 1))
          (uid, path.count(_ == 0).toLong, path.count(_ == 1).toLong, switches.toLong)
        }
        .toDF("user_id", "n_low", "n_high", "n_switches")
    },
    Some("""SELECT * FROM (VALUES
        (1, 3, 3, 1), (2, 5, 0, 0), (3, 2, 1, 2),
        (4, 3, 0, 0), (5, 0, 4, 0), (6, 3, 2, 4))
      t(user_id, n_low, n_high, n_switches)"""))

  /** E12 — LCC geodesy: project lon/lat to planar feet, planar distance to
    * a reference point, averaged per nation. */
  val q41LccDistance = Q(
    "q41_lcc_distance",
    (s, d) => {
      val c = customer(s, d)
        .withColumn("lon", lit(-122.0) + col("c_acctbal") / 10000.0)
        .withColumn("lat", lit(37.0) + col("c_nationkey") / 100.0)
      val (x, y) = Exprs.lccXY(col("lon"), col("lat"))
      val (x0, y0) = lccRefPoint
      c.withColumn("dist_ft", Exprs.planarDist(x, y, lit(x0), lit(y0)))
        .groupBy("c_nationkey")
        .agg(round(avg("dist_ft"), 1).as("avg_dist_ft"), count(lit(1)).as("n"))
    },
    Some {
      val d2r = math.Pi / 180.0
      val (n, rf, rho0) = Exprs.lccConstants(37.066667, 38.433333, 36.5)
      val (x0, y0) = lccRefPoint
      s"""WITH pts AS (
        SELECT c_nationkey,
          (-122.0 + c_acctbal / 10000.0) * $d2r AS lon,
          (37.0 + c_nationkey / 100.0) * $d2r AS lat
        FROM customer),
      proj AS (
        SELECT c_nationkey,
          ($rf / power(tan(pi() / 4 + lat / 2), $n))
            * sin($n * (lon - ${-120.5 * d2r})) + 6561666.667 AS x,
          $rho0 - ($rf / power(tan(pi() / 4 + lat / 2), $n))
            * cos($n * (lon - ${-120.5 * d2r})) + 1640416.667 AS y
        FROM pts)
      SELECT c_nationkey,
        round(avg(sqrt(power(x - $x0, 2) + power(y - $y0, 2))), 1) AS avg_dist_ft,
        count(*) AS n
      FROM proj GROUP BY 1"""
    })

  /** Reference point for q41: downtown SF projected with the same
    * constants (computed once in Scala, inlined into both engines). */
  lazy val lccRefPoint: (Double, Double) = {
    val d2r = math.Pi / 180.0
    val (n, rf, rho0) = Exprs.lccConstants(37.066667, 38.433333, 36.5)
    val lat = 37.77 * d2r; val lon = -122.4 * d2r
    val rho = rf / math.pow(math.tan(math.Pi / 4 + lat / 2), n)
    val theta = n * (lon - (-120.5 * d2r))
    (rho * math.sin(theta) + 6561666.667,
      rho0 - rho * math.cos(theta) + 1640416.667)
  }

  // ----------------------------------- §2.5 A2-A7 cascade + §2.8 E5 measures
  /** A2->A5->A6 — the reference's weighted aggregation cascade: one rule
    * table drives three levels (detail -> group -> system), maxLevel drops
    * columns as the hierarchy coarsens, each level re-weighted by the
    * count of the level below (SFMuniDataAggregator.py:187-804). */
  val q42AggCascade = Q(
    "q42_agg_cascade",
    (s, d) => {
      val base = lineitem(s, d).join(orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("month", date_trunc("MONTH", col("o_orderdate")))
      // level 1: month x priority x returnflag
      val l1 = RuleAgg.aggregate(base,
        Seq("month", "o_orderpriority", "l_returnflag"),
        Seq(AggRule("n_items", "l_orderkey", AggMethod.Count),
          AggRule("sum_qty", "l_quantity", AggMethod.Sum),
          AggRule("wavg_price", "l_extendedprice", AggMethod.WgtAvg)),
        weight = Some("l_quantity"))
      // level 2: drop returnflag; re-weight by n_items (maxLevel drops sum_qty)
      val l2Rules = Seq(
        AggRule("n_items", "n_items", AggMethod.Sum),
        AggRule("sum_qty", "sum_qty", AggMethod.Sum, maxLevel = 2),
        AggRule("wavg_price", "wavg_price", AggMethod.WgtAvg))
      val l2 = RuleAgg.aggregate(l1, Seq("month", "o_orderpriority"),
        l2Rules, level = 2, weight = Some("n_items"))
      // level 3: system per month (sum_qty dropped by maxLevel)
      val l3 = RuleAgg.aggregate(l2, Seq("month"),
        l2Rules, level = 3, weight = Some("n_items"))
      l3.select(col("month"), col("n_items"),
        round(col("wavg_price"), 4).as("wavg_price"))
    },
    Some("""WITH base AS (
        SELECT date_trunc('month', o_orderdate) AS month, o_orderpriority,
          l_returnflag, l_quantity, l_extendedprice
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      l1 AS (
        SELECT month, o_orderpriority, l_returnflag,
          count(*) AS n_items, sum(l_quantity) AS sum_qty,
          sum(l_extendedprice * l_quantity) / sum(l_quantity) AS wavg_price
        FROM base GROUP BY 1, 2, 3),
      l2 AS (
        SELECT month, o_orderpriority,
          CAST(sum(n_items) AS BIGINT) AS n_items,
          sum(wavg_price * n_items) / sum(n_items) AS wavg_price
        FROM l1 GROUP BY 1, 2),
      l3 AS (
        SELECT month, CAST(sum(n_items) AS BIGINT) AS n_items,
          sum(wavg_price * n_items) / sum(n_items) AS wavg_price
        FROM l2 GROUP BY 1)
      SELECT month, n_items, round(wavg_price, 4) AS wavg_price FROM l3"""))

  /** E5 — the reference's performance-measure semantics: schedule
    * deviation, on-time flag, and weighted delay, all masked to observed
    * rows (SFMuniDataExpander.py:538-590). "Scheduled" = order date,
    * "actual" = ship date, "observed" = finalized lines. */
  val q43PerfMeasures = Q(
    "q43_perf_measures",
    (s, d) => {
      val j = lineitem(s, d).join(orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("dev_days",
          datediff(col("l_shipdate"), col("o_orderdate")).cast("double"))
        .withColumn("observed", (col("l_linestatus") === "F").cast("int"))
        .withColumn("ontime30",
          when(col("observed") === 0, lit(null))
            .otherwise((col("dev_days") <= 30).cast("int")))
        .withColumn("pass_delay",
          when(col("observed") === 0, lit(null))
            .otherwise(col("l_quantity") * greatest(col("dev_days") - 30, lit(0.0))))
      j.groupBy(col("l_returnflag"), date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(round(avg("ontime30"), 6).as("ontime_pct"),
          round(sum("pass_delay"), 2).as("pass_delay"),
          sum("observed").as("n_observed"),
          count(lit(1)).as("n_total"))
    },
    Some("""WITH j AS (
        SELECT l_returnflag, date_trunc('month', o_orderdate) AS month,
          CAST(date_diff('day', o_orderdate, l_shipdate) AS DOUBLE) AS dev_days,
          CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS observed,
          l_quantity
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      m AS (
        SELECT l_returnflag, month, observed,
          CASE WHEN observed = 0 THEN NULL
               WHEN dev_days <= 30 THEN 1 ELSE 0 END AS ontime30,
          CASE WHEN observed = 0 THEN NULL
               ELSE l_quantity * greatest(dev_days - 30, 0.0) END AS pass_delay
        FROM j)
      SELECT l_returnflag, month,
        round(avg(ontime30), 6) AS ontime_pct,
        round(sum(pass_delay), 2) AS pass_delay,
        CAST(sum(observed) AS BIGINT) AS n_observed,
        count(*) AS n_total
      FROM m GROUP BY 1, 2"""))

  /** Embedding cosine near-duplicate pairs through the LSH-bucketed scale
    * path (Dedup.embeddingNearDupPairs): candidates only form inside a
    * shared 8-plane sign bucket — an equi-join, never a cross product —
    * then exact-cosine verified. The earlier all-pairs form (id1 < id2
    * non-equi join, BroadcastNestedLoopJoin) was correct at sf0.01 but
    * O(n^2) compares at scale; the exact brute check on a bounded sample
    * lives in the ScalaTest spec instead. */
  val q44EmbeddingNeardup = Q(
    "q44_embedding_neardup",
    (s, d) =>
      Dedup.embeddingNearDupPairs(embeddings(s, d), "vec_id", "embedding",
        threshold = 0.3, planes = 8, dims = 64),
    Some {
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      b AS (
        SELECT vec_id, e,
          ${duckBucketExpr(8, 64, "e")} AS bucket
        FROM v)
      SELECT a.vec_id AS id1, b.vec_id AS id2,
        round(list_cosine_similarity(a.e, b.e), 6) AS cos
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.e, b.e) >= 0.3"""
    })

  /** W7 — per-sequence derived-state chain (GTFSHelper.py:375-527): start/
    * end-of-line flags, inter-stop gap, cumulative distance along the
    * sequence — four window functions over one (partition, order) spec,
    * so Catalyst computes them in a single Window operator. */
  val q45SequenceChain = Q(
    "q45_sequence_chain",
    (s, d) => {
      val ord = Seq("l_linenumber", "l_shipdate", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice").map(col)
      val w = Window.partitionBy(col("l_orderkey")).orderBy(ord: _*)
      val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val li = lineitem(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("l_orderkey"))))
        .withColumn("sol", (col("rn") === 1).cast("int"))
        .withColumn("eol", (col("rn") === col("n")).cast("int"))
        .withColumn("gap_days",
          coalesce(datediff(col("l_shipdate"), lag(col("l_shipdate"), 1).over(w)), lit(0))
            .cast("double"))
        .withColumn("cum_qty", sum("l_quantity").over(wcum))
      li.groupBy("l_returnflag")
        .agg(sum("sol").as("n_sol"), sum("eol").as("n_eol"),
          round(avg("gap_days"), 4).as("avg_gap_days"),
          round(max("cum_qty"), 2).as("max_cum_qty"))
    },
    Some("""WITH seq AS (
        SELECT l_returnflag, l_orderkey, l_quantity, l_shipdate,
          row_number() OVER w AS rn,
          count(*) OVER (PARTITION BY l_orderkey) AS n,
          lag(l_shipdate) OVER w AS prev_ship,
          sum(l_quantity) OVER (PARTITION BY l_orderkey
            ORDER BY l_linenumber, l_shipdate, l_partkey, l_suppkey,
                     l_quantity, l_extendedprice
            ROWS UNBOUNDED PRECEDING) AS cum_qty
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_shipdate, l_partkey, l_suppkey,
                   l_quantity, l_extendedprice))
      SELECT l_returnflag,
        CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sol,
        CAST(sum(CASE WHEN rn = n THEN 1 ELSE 0 END) AS BIGINT) AS n_eol,
        round(avg(CAST(COALESCE(date_diff('day', prev_ship, l_shipdate), 0) AS DOUBLE)), 4) AS avg_gap_days,
        round(max(cum_qty), 2) AS max_cum_qty
      FROM seq GROUP BY 1"""))

  // ------------------------------------------------ §2.1 source variants
  /** S8 — directory-glob ingestion with year recovered from the file path
    * (DemandHelper.py:736-790 globs ACS_<year>_*.csv). The fixture is the
    * orders table partitioned into year=<y> CSV directories; the reader
    * globs them WITHOUT partition discovery and parses the year out of
    * input_file_name(). */
  val q46GlobIngest = Q(
    "q46_glob_ingest",
    (s, d) => {
      val tag = d.replaceAll(".*/", "")
      val path = graft.sources.Scratch.dir(s"glob_$tag")
      orders(s, d)
        .withColumn("year", year(col("o_orderdate")))
        .select("o_orderkey", "o_totalprice", "year")
        .write.mode("overwrite").option("header", "true")
        .partitionBy("year").csv(path)
      s.read.option("header", "true").csv(s"$path/year=*")
        .withColumn("year",
          regexp_extract(input_file_name(), "year=(\\d+)", 1).cast("long"))
        .groupBy("year")
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("double")), 2).as("revenue"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS year, count(*) AS n,
        round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1"""))

  /** S2 — TAB-variant reader: timestamp decomposed into integer date/time
    * part columns in a TSV, recombined on read (SFMuniDataHelper.py:
    * 414-420,454-473 recombines HR/MIN/SEC and MO/DAY/YR to ints). */
  val q47TabVariant = Q(
    "q47_tab_variant",
    (s, d) => {
      val tag = d.replaceAll(".*/", "")
      val path = graft.sources.Scratch.dir(s"tab_$tag")
      events(s, d).select(
          col("event_id"),
          year(col("ts")).as("yr"), month(col("ts")).as("mo"),
          dayofmonth(col("ts")).as("dy"), hour(col("ts")).as("hr"),
          minute(col("ts")).as("mi"), second(col("ts")).as("se"),
          col("value"))
        .write.mode("overwrite").option("header", "true").option("sep", "\t")
        .csv(path)
      s.read.option("header", "true").option("sep", "\t")
        .option("inferSchema", "true").csv(path)
        .withColumn("ts", make_timestamp(
          col("yr"), col("mo"), col("dy"), col("hr"), col("mi"),
          col("se").cast("decimal(8,6)")))
        .groupBy(to_date(col("ts")).cast("timestamp").as("day"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
    },
    Some("""SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, count(*) AS n,
        round(sum(value), 4) AS sum_value
      FROM events GROUP BY 1"""))

  /** S5 + W1 + E1 — GTFS feed: zip members read as schema'd CSVs, the
    * object-model walk re-expressed as joins, service-day times >= 24:00
    * parsed to seconds, headways per (route, dir, stop). The oracle is the
    * same deterministic fixture computed independently in plain Scala and
    * inlined as a VALUES table. */
  val q48Gtfs = Q(
    "q48_gtfs",
    (s, d) => {
      import graft.sources.Gtfs
      val base = graft.sources.Scratch.dir("gtfs")
      Gtfs.writeZip(s"$base/feed.zip", gtfsFixture)
      Gtfs.extractZip(s"$base/feed.zip", s"$base/feed")
      Gtfs.tripStopSchedule(Gtfs.readFeed(s, s"$base/feed"))
        .select(col("route_short_name"), col("stop_id"), col("trip_id"),
          col("dep_s"), col("headway_min"))
    },
    Some {
      val rows = gtfsExpected.map { case (rsn, stop, trip, depS, hw) =>
        val h = hw.map(_.toString).getOrElse("CAST(NULL AS DOUBLE)")
        s"('$rsn', '$stop', '$trip', $depS, $h)"
      }.mkString(",\n        ")
      s"""SELECT * FROM (VALUES
        $rows)
        t(route_short_name, stop_id, trip_id, dep_s, headway_min)"""
    })

  /** GTFS fixture: 2 routes, 5 trips x 3 stops; trips t4/t5 run past
    * midnight (24:xx departure times exercise the E1 wraparound parse). */
  private lazy val gtfsTrips: Seq[(String, String, Int)] = Seq(
    // (trip_id, route_id, start seconds since service midnight)
    ("t1", "R1", 8 * 3600), ("t2", "R1", 8 * 3600 + 12 * 60),
    ("t3", "R1", 8 * 3600 + 30 * 60),
    ("t4", "R2", 23 * 3600 + 55 * 60), ("t5", "R2", 24 * 3600 + 40 * 60))

  private def secToGtfs(sec: Int): String =
    f"${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d"

  /** Cumulative shape distance at stops 1..3 in meters (stop_times
    * shape_dist_traveled; S1's 0 exercises the sdt<=0 fallback branch). */
  private val gtfsSdt = Seq(0, 1000, 2500)

  private lazy val gtfsFixture: Seq[(String, String)] = {
    val routes = "route_id,route_short_name,route_type\nR1,10,3\nR2,N,3\n"
    // R1's trips run weekdays; R2's owl trips run the Saturday service
    val svc = Map("R1" -> "WKDY", "R2" -> "SAT")
    val trips = "trip_id,route_id,service_id,direction_id\n" +
      gtfsTrips.map { case (t, r, _) => s"$t,$r,${svc(r)},0" }.mkString("\n") + "\n"
    val stopTimes = "trip_id,stop_id,stop_sequence,arrival_time,departure_time,shape_dist_traveled\n" +
      (for ((t, _, start) <- gtfsTrips; k <- 1 to 3) yield {
        val dep = start + (k - 1) * 4 * 60
        s"$t,S$k,$k,${secToGtfs(dep)},${secToGtfs(dep)},${gtfsSdt(k - 1)}"
      }).mkString("\n") + "\n"
    val calendar = "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\n" +
      "WKDY,1,1,1,1,1,0,0,20240101,20240114\n" +
      "SAT,0,0,0,0,0,1,0,20240101,20240114\n" +
      "SUN,0,0,0,0,0,0,1,20240101,20240114\n"
    val fareAttrs = "fare_id,price,currency_type\nf1,2.50,USD\nf2,3.00,USD\n"
    val fareRules = "fare_id,route_id\nf1,R1\nf2,R2\n"
    Seq("routes.txt" -> routes, "trips.txt" -> trips,
      "stop_times.txt" -> stopTimes, "calendar.txt" -> calendar,
      "fare_attributes.txt" -> fareAttrs, "fare_rules.txt" -> fareRules)
  }

  /** Expected q48 rows computed independently of Spark:
    * (route_short_name, stop_id, trip_id, dep_s, headway_min). */
  private lazy val gtfsExpected: Seq[(String, String, String, Int, Option[Double])] = {
    val rsn = Map("R1" -> "10", "R2" -> "N")
    val rows = for ((t, r, start) <- gtfsTrips; k <- 1 to 3)
      yield (r, s"S$k", t, start + (k - 1) * 4 * 60)
    rows.groupBy(x => (x._1, x._2)).toSeq.flatMap { case (_, grp) =>
      val sorted = grp.sortBy(x => (x._4, x._3))
      sorted.zipWithIndex.map { case ((r, stop, trip, dep), i) =>
        val hw = if (i == 0) None
          else Some((dep - sorted(i - 1)._4) / 60.0)
        (rsn(r), stop, trip, dep, hw)
      }
    }
  }

  /** §3 — the reference's flagship pipeline end-to-end on the deterministic
    * transit fixture: fixed-width AVL → clean (filters, service-day, dedup,
    * route-equiv interval join) → expand (J1, W2 runtime, E5 measures) →
    * A1 trips → W8 weighting → weighted cascade to system/day. Oracle =
    * hand-computed goldens (see TransitPipelineSpec for the derivations).
    */
  val q49TransitPipeline = Q(
    "q49_transit_pipeline",
    (s, d) => {
      val out = graft.pipelines.TransitFixture
        .run(s, graft.sources.Scratch.dir("transit"))("system_day")
      out.select(col("DATE").cast("timestamp").as("date"),
        col("TRIPS"), col("ON"),
        round(col("ONTIME5"), 6).as("ONTIME5"), col("PASSMILES"),
        round(col("PASSHOURS"), 6).as("PASSHOURS"),
        round(col("WAITHOURS"), 6).as("WAITHOURS"),
        col("FULLFARE_REV"), col("PASSDELAY_DEP"), col("PASSDELAY_ARR"),
        round(col("VC"), 6).as("VC"),
        round(col("CROWDED"), 6).as("CROWDED"),
        round(col("CROWDHOURS"), 6).as("CROWDHOURS"))
    },
    Some("""SELECT * FROM (VALUES
        (TIMESTAMP '2024-01-15 00:00:00', 3.0, 17.0, 0.777778, 11.0,
         2.466667, 1.416667, 42.5, 51.0, 39.0, 0.666667, 0.666667, 1.6),
        (TIMESTAMP '2024-02-15 00:00:00', 1.0, 4.0, 1.0, 0.0,
         0.0, 0.333333, 10.0, 4.0, 0.0, 0.0, 0.0, 0.0))
      t(date, TRIPS, "ON", ONTIME5, PASSMILES, PASSHOURS, WAITHOURS,
        FULLFARE_REV, PASSDELAY_DEP, PASSDELAY_ARR, VC, CROWDED, CROWDHOURS)"""))

  /** Clipper linked-trip flow (ClipperHelper.py:177-258): W4 transfer
    * sessionization (gap < 90 min = transfer), From_* attribute carry via
    * lag, E8 DOW-based expansion weights, linked weight w/(1+transfers).
    * DOW computed as (epoch_days+4)%7 — identical arithmetic in both
    * engines (engine dayofweek() conventions differ). */
  val q50LinkedTrips = Q(
    "q50_linked_trips",
    (s, d) => {
      val sess = Windows.sessionize(events(s, d), Seq("user_id"), "ts",
        Seq("event_id"), gapMinutes = 90.0, sessionCol = "linked_trip_id")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val g = Window.partitionBy(col("user_id"), col("linked_trip_id"))
      val dow = (datediff(Exprs.serviceDate(col("ts")), lit("1970-01-01").cast("date")) + 4) % 7
      sess
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .withColumn("dow", dow)
        .withColumn("base_weight",
          when(col("dow").isin(0, 6), 2.0 / 3).otherwise(2.0 / 15))
        .withColumn("n_legs", count(lit(1)).over(g))
        .withColumn("linked_weight", col("base_weight") / col("n_legs"))
        .groupBy("user_id", "linked_trip_id")
        .agg(max("n_legs").as("n_legs"),
          (max("n_legs") - 1).cast("long").as("transfers"),
          // struct-min, not min_by/arg_min: DuckDB's arg_min SKIPS null
          // values, Spark's min_by keeps them — struct-min keeps the
          // null-at-first-leg semantics identical in both engines
          min(struct(col("ts"), col("event_type"))).getField("event_type").as("first_type"),
          min(struct(col("ts"), col("from_type"))).getField("from_type").as("from_type_at_start"),
          round(max("linked_weight"), 6).as("linked_weight"))
    },
    Some("""WITH s AS (
        SELECT user_id, ts, event_id, event_type,
          lag(event_type) OVER w AS from_type,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR (epoch(ts) - epoch(lag(ts) OVER w)) / 60.0 >= 90
               THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      s2 AS (
        SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS linked_trip_id,
          (date_diff('day', DATE '1970-01-01',
             CASE WHEN hour(ts) < 3 THEN CAST(ts AS DATE) - INTERVAL 1 DAY
                  ELSE CAST(ts AS DATE) END) + 4) % 7 AS dow
        FROM s),
      s3 AS (
        SELECT *, CASE WHEN dow IN (0, 6) THEN 2.0/3 ELSE 2.0/15 END AS base_weight,
          count(*) OVER (PARTITION BY user_id, linked_trip_id) AS n_legs
        FROM s2)
      SELECT user_id, linked_trip_id,
        CAST(max(n_legs) AS BIGINT) AS n_legs,
        CAST(max(n_legs) - 1 AS BIGINT) AS transfers,
        (min(struct_pack(k := ts, v := event_type))).v AS first_type,
        (min(struct_pack(k := ts, v := from_type))).v AS from_type_at_start,
        round(max(base_weight / n_legs), 6) AS linked_weight
      FROM s3 GROUP BY 1, 2"""))

  /** §3.3 — the reporter's FULL system-performance battery
    * (TransitReporter.py:123-172, assembleSystemPerformanceData): a
    * monthly system table in the reference vocabulary (each measure stood
    * in by a deterministic lineitem aggregate — exact decimal sums for
    * money-like columns, integral sums and distinct counts elsewhere)
    * through Transit.systemPerformance: all derived measures incl.
    * DWELL_PER_STOP, FARE_PER_PASS, MILES_PER_PASS, IVT_PER_PAS,
    * PASSPEED, WAIT_PER_PAS, DELAY_*_PER_PASS, OBSERVED_PCT, IMPUTED_PCT,
    * the MEASURE_ERR / WEIGHT_ERR audit columns and their estimation
    * fields (:152-160), then the MONTH-keyed demand-driver left joins
    * (employment TOTEMP, population POP, auto-op-cost FUEL_PRICE,
    * :163-172). 44 output columns, every division floor-scaled at 6dp
    * (see systemPerformance's determinism contract). */
  val q51ReportAssembly = Q(
    "q51_report_assembly",
    (s, d) => {
      val m = (c: Column) => date_trunc("MONTH", c).as("MONTH")
      def floor6(c: Column) = floor(c * 1e6) / 1e6
      val qdec = col("l_quantity").cast("decimal(18,2)")
      val taxDec = col("l_tax").cast("decimal(4,2)")
      // distinct counts as two-stage aggregations, NOT countDistinct in
      // the main agg: five distinct aggregates would plan a 6x Expand of
      // the fact table (one replica per distinct spec); keyed pre-aggs +
      // an 80-row broadcast join back is the shape that survives 100x
      // (measured 2x+ on this query at sf0.1)
      val ords = lineitem(s, d)
        .groupBy(m(col("l_shipdate")), col("l_orderkey"))
        .agg(max((col("l_linestatus") === "F").cast("int")).as("__f"),
          max((col("l_linestatus") === "O").cast("int")).as("__o"))
        .groupBy(col("MONTH"))
        .agg(count(lit(1)).as("TRIPS"),
          count_if(col("__f") === 1).as("OBS_TRIPS"),
          count_if(col("__o") === 1).as("IMP_TRIPS"))
      val days = lineitem(s, d)
        .groupBy(m(col("l_shipdate")), col("l_shipdate"))
        .agg(max((col("l_linestatus") === "F").cast("int")).as("__f"))
        .groupBy(col("MONTH"))
        .agg(count(lit(1)).as("NUMDAYS"), count_if(col("__f") === 1).as("OBSDAYS"))
      val agg = lineitem(s, d).groupBy(m(col("l_shipdate"))).agg(
        count(lit(1)).as("TRIP_STOPS"),
        sum(col("l_quantity")).as("ON"),
        sum(qdec * (lit(1.00).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
          .cast("double").as("OFF"),
        sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0.0)).as("RDBRDNGS"),
        dsum(col("l_extendedprice")).as("SERVMILES"),
        sum(when(col("l_linestatus") === "F", col("l_extendedprice").cast("decimal(18,6)")))
          .cast("double").as("SERVMILES_S"),
        sum(revDec).cast("double").as("PASSMILES"),
        sum(qdec * taxDec).cast("double").as("PASSHOURS"),
        dsum(col("l_tax")).as("DWELL"),
        dsum(col("l_discount")).as("WAITHOURS"),
        sum(col("l_extendedprice").cast("decimal(18,2)") * taxDec).cast("double").as("FULLFARE_REV"),
        sum(when(col("l_discount") > 0.05, col("l_quantity")).otherwise(0.0)).as("PASSDELAY_DEP"),
        sum(when(col("l_tax") > 0.04, col("l_quantity")).otherwise(0.0)).as("PASSDELAY_ARR"),
        count_if(col("l_discount") <= 0.05).as("N_ONTIME"),
        max(col("l_quantity")).as("MAX_LOAD"),
        count_if(col("l_quantity") > 40).as("N_CROWDED"),
        sum(when(col("l_quantity") > 40, col("l_quantity")).otherwise(0.0)).as("CROWD_QTY"))
      val trips = agg
        .join(broadcast(ords), Seq("MONTH"))
        .join(broadcast(days), Seq("MONTH"))
        .withColumn("ONTIME5", floor6(col("N_ONTIME").cast("double") / col("TRIP_STOPS")))
        .withColumn("VC", floor6(col("MAX_LOAD") / lit(50.0)))
        .withColumn("CROWDED", floor6(col("N_CROWDED").cast("double") / col("TRIP_STOPS")))
        .withColumn("CROWDHOURS", floor6(col("CROWD_QTY") / lit(60.0)))
        .withColumn("HEADWAY_S", floor6(col("ON") / col("TRIP_STOPS")))
        .drop("N_ONTIME", "MAX_LOAD", "N_CROWDED", "CROWD_QTY")
      val employment = orders(s, d).groupBy(m(col("o_orderdate")))
        .agg(countDistinct(col("o_custkey")).as("TOTEMP"))
      val population = orders(s, d).groupBy(m(col("o_orderdate")))
        .agg(count(lit(1)).as("POP"))
      val autoOp = events(s, d).groupBy(m(col("ts")))
        .agg(round(avg(col("value")), 4).as("FUEL_PRICE"))
        .withColumn("FUEL_PRICE_2010USD", round(col("FUEL_PRICE") / 1.25, 4))
      graft.pipelines.Transit.systemPerformance(trips, employment, population, autoOp)
    },
    Some("""WITH t AS (
        SELECT date_trunc('month', l_shipdate) AS "MONTH",
          count(*) AS TRIP_STOPS,
          count(DISTINCT l_orderkey) AS TRIPS,
          count(DISTINCT CASE WHEN l_linestatus = 'F' THEN l_orderkey END) AS OBS_TRIPS,
          count(DISTINCT CASE WHEN l_linestatus = 'O' THEN l_orderkey END) AS IMP_TRIPS,
          sum(l_quantity) AS "ON",
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
            * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS OFF,
          sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END) AS RDBRDNGS,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS SERVMILES,
          CAST(sum(CASE WHEN l_linestatus = 'F'
            THEN CAST(l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE) AS SERVMILES_S,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS PASSMILES,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
            * CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) AS PASSHOURS,
          CAST(sum(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) AS DWELL,
          CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS WAITHOURS,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) AS FULLFARE_REV,
          sum(CASE WHEN l_discount > 0.05 THEN l_quantity ELSE 0.0 END) AS PASSDELAY_DEP,
          sum(CASE WHEN l_tax > 0.04 THEN l_quantity ELSE 0.0 END) AS PASSDELAY_ARR,
          count(*) FILTER (WHERE l_discount <= 0.05) AS N_ONTIME,
          max(l_quantity) AS MAX_LOAD,
          count(*) FILTER (WHERE l_quantity > 40) AS N_CROWDED,
          sum(CASE WHEN l_quantity > 40 THEN l_quantity ELSE 0.0 END) AS CROWD_QTY,
          count(DISTINCT l_shipdate) AS NUMDAYS,
          count(DISTINCT CASE WHEN l_linestatus = 'F' THEN l_shipdate END) AS OBSDAYS
        FROM lineitem GROUP BY 1),
      t2 AS (
        SELECT t.*,
          floor(CAST(N_ONTIME AS DOUBLE) / TRIP_STOPS * 1e6) / 1e6 AS ONTIME5,
          floor(MAX_LOAD / 50.0 * 1e6) / 1e6 AS VC,
          floor(CAST(N_CROWDED AS DOUBLE) / TRIP_STOPS * 1e6) / 1e6 AS CROWDED,
          floor(CROWD_QTY / 60.0 * 1e6) / 1e6 AS CROWDHOURS,
          floor("ON" / TRIP_STOPS * 1e6) / 1e6 AS HEADWAY_S
        FROM t),
      t3 AS (
        SELECT t2.*,
          CASE WHEN TRIP_STOPS <> 0
            THEN floor(DWELL / TRIP_STOPS * 1e6) / 1e6 END AS DWELL_PER_STOP,
          CASE WHEN "ON" <> 0
            THEN floor(FULLFARE_REV / "ON" * 1e6) / 1e6 END AS FARE_PER_PASS,
          CASE WHEN "ON" <> 0
            THEN floor(PASSMILES / "ON" * 1e6) / 1e6 END AS MILES_PER_PASS,
          CASE WHEN "ON" <> 0
            THEN floor(PASSHOURS / "ON" * 60.0 * 1e6) / 1e6 END AS IVT_PER_PAS,
          CASE WHEN "ON" <> 0
            THEN floor(WAITHOURS / "ON" * 60.0 * 1e6) / 1e6 END AS WAIT_PER_PAS,
          CASE WHEN "ON" <> 0
            THEN floor(PASSDELAY_DEP / "ON" * 1e6) / 1e6 END AS DELAY_DEP_PER_PASS,
          CASE WHEN "ON" <> 0
            THEN floor(PASSDELAY_ARR / "ON" * 1e6) / 1e6 END AS DELAY_ARR_PER_PASS,
          CASE WHEN TRIPS <> 0
            THEN floor(CAST(OBS_TRIPS AS DOUBLE) / TRIPS * 1e6) / 1e6 END AS OBSERVED_PCT,
          CASE WHEN TRIPS <> 0
            THEN floor(CAST(IMP_TRIPS AS DOUBLE) / TRIPS * 1e6) / 1e6 END AS IMPUTED_PCT,
          CASE WHEN "ON" <> 0
            THEN floor((OFF / "ON" - 1.0) * 1e6) / 1e6 END AS MEASURE_ERR,
          CASE WHEN SERVMILES_S <> 0
            THEN floor((SERVMILES / SERVMILES_S - 1.0) * 1e6) / 1e6 END AS WEIGHT_ERR,
          OFF - "ON" AS OFF_MINUS_ON,
          SERVMILES - SERVMILES_S AS SERVMILES_MINUS_SERVMILES_S
        FROM t2),
      t4 AS (
        SELECT t3.*,
          CASE WHEN IVT_PER_PAS <> 0
            THEN floor(MILES_PER_PASS / IVT_PER_PAS * 60.0 * 1e6) / 1e6 END AS PASSPEED,
          MEASURE_ERR * "ON" AS MEASURE_ERR_ON,
          WEIGHT_ERR * "ON" AS WEIGHT_ERR_ON
        FROM t3),
      e AS (SELECT date_trunc('month', o_orderdate) AS "MONTH",
          count(DISTINCT o_custkey) AS TOTEMP FROM orders GROUP BY 1),
      p AS (SELECT date_trunc('month', o_orderdate) AS "MONTH",
          count(*) AS POP FROM orders GROUP BY 1),
      a AS (SELECT date_trunc('month', ts) AS "MONTH",
          round(avg(value), 4) AS FUEL_PRICE,
          round(round(avg(value), 4) / 1.25, 4) AS FUEL_PRICE_2010USD
        FROM events GROUP BY 1)
      SELECT t4.* EXCLUDE (N_ONTIME, MAX_LOAD, N_CROWDED, CROWD_QTY),
        TOTEMP, POP, FUEL_PRICE, FUEL_PRICE_2010USD
      FROM t4 LEFT JOIN e USING ("MONTH") LEFT JOIN p USING ("MONTH")
      LEFT JOIN a USING ("MONTH")"""))

  /** E9 — time-of-day bucketing on an HHMM int. */
  val q52TodBucket = Q(
    "q52_tod_bucket",
    (s, d) =>
      events(s, d)
        .withColumn("hhmm", hour(col("ts")) * 100 + minute(col("ts")))
        .withColumn("tod", Exprs.todBucket(col("hhmm")))
        .groupBy("tod")
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value")),
    Some("""WITH h AS (
        SELECT value, hour(ts) * 100 + minute(ts) AS hhmm FROM events),
      b AS (
        SELECT value, CASE
          WHEN hhmm < 300 THEN 'EVENING'
          WHEN hhmm < 600 THEN 'EARLY MORNING'
          WHEN hhmm < 900 THEN 'AM PEAK'
          WHEN hhmm < 1400 THEN 'MIDDAY'
          WHEN hhmm < 1600 THEN 'SCHOOL'
          WHEN hhmm < 1900 THEN 'PM PEAK'
          ELSE 'EVENING' END AS tod
        FROM h)
      SELECT tod, count(*) AS n, round(avg(value), 4) AS avg_value
      FROM b GROUP BY 1"""))

  /** Sketch aggregates — the 100 TB path for countDistinct/percentile
    * (HLL + KLL-style). DELIBERATELY oracle-exempt, the one such query in
    * the catalog: a sketch's exact output is a function of its internal
    * layout (register count, hash, compaction schedule), which no two
    * engines share — DuckDB's approx_count_distinct would only hash-match
    * by coincidence. The correctness contract is the error bound, asserted
    * against exact values in SketchSpec (HLL within 5%, p95 within the
    * value-range epsilon); the rows-only driver check still pins shape. */
  val q53Sketches = Q(
    "q53_sketches",
    (s, d) =>
      // sketch estimates are engine-specific, so raw values can't hash
      // against DuckDB — instead the query ASSERTS the sketches' error
      // bounds against the exact aggregates (the SketchSpec bounds,
      // driver-checkable): a drifting sketch flips a boolean to false
      // and hash-mismatches the all-true oracle. approx_count_distinct's
      // default rsd 0.05 is ONE standard deviation of HLL++ relative
      // error, not a guarantee — the assertion uses 3x rsd (= 15%,
      // ~99.7% coverage) so a legitimate 1-sigma excursion at an
      // untested scale can't fake a correctness failure; the tight 5%
      // observation stays asserted in SketchSpec on the known tables.
      // approx_percentile at default accuracy sits orders of magnitude
      // inside 2% on these group sizes.
      // The exact distinct count runs as its OWN two-stage aggregation
      // joined back on the 3-row group frame: countDistinct inline with
      // the percentile aggregates would plan an Expand that doubles
      // every input row through the sort-heavy percentile path
      // (measured 9 s steady vs ~3 s split).
      {
        val base = lineitem(s, d).groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            approx_count_distinct(col("l_partkey")).as("__approx_parts"),
            expr("percentile(l_extendedprice, 0.95)").as("__exact_p95"),
            expr("approx_percentile(l_extendedprice, 0.95)").as("__approx_p95"))
        val dist = lineitem(s, d).select("l_returnflag", "l_partkey")
          .distinct()
          .groupBy("l_returnflag").agg(count(lit(1)).as("exact_parts"))
        base.join(broadcast(dist), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n"), col("exact_parts"),
            (abs(col("__approx_parts") - col("exact_parts")) /
              col("exact_parts") <= 0.15).as("parts_within_3rsd"),
            (abs(col("__approx_p95") - col("__exact_p95")) /
              col("__exact_p95") <= 0.02).as("p95_within_2pct"))
      },
    Some("""SELECT l_returnflag, count(*) AS n,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        true AS parts_within_3rsd, true AS p95_within_2pct
      FROM lineitem GROUP BY 1"""))

  /** T6 — anchored cumulative reconstruction: monthly net changes plus one
    * absolute anchor rebuild the level series forward AND backward
    * (DemandHelper.py:923-933's two iterative loops, as two window exprs). */
  val q54Reconstruct = Q(
    "q54_reconstruct",
    (s, d) => {
      val net = orders(s, d)
        .groupBy(date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).cast("double").as("net"))
      TimeSeries.reconstructFromAnchor(net, Seq.empty, "month", "net",
          anchorAt = col("month") === lit("1998-01-01").cast("timestamp"),
          anchorValue = lit(1000.0), out = "stock")
        .select(col("month"), round(col("stock"), 2).as("stock"))
    },
    Some("""WITH net AS (
        SELECT date_trunc('month', o_orderdate) AS month,
          CAST(count(*) AS DOUBLE) AS net
        FROM orders GROUP BY 1),
      c AS (
        SELECT month, sum(net) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING) AS cum
        FROM net)
      SELECT month, round(1000.0 + cum -
        (SELECT cum FROM c WHERE month = TIMESTAMP '1998-01-01'), 2) AS stock
      FROM c"""))

  /** W3 — trip-id disambiguation: append the group's min sequence number
    * to the trip key (SFMuniDataExpander.py:55-63). */
  val q55TripIdDisambig = Q(
    "q55_tripid_disambig",
    (s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
      lineitem(s, d)
        .withColumn("trip_key",
          concat(col("l_orderkey"), lit("_"), min("l_linenumber").over(w)))
        .groupBy("l_returnflag")
        .agg(countDistinct(col("trip_key")).as("n_trips"),
          count(lit(1)).as("n_rows"))
    },
    Some("""WITH t AS (
        SELECT l_returnflag,
          l_orderkey || '_' || min(l_linenumber) OVER (PARTITION BY l_orderkey) AS trip_key
        FROM lineitem)
      SELECT l_returnflag, CAST(count(DISTINCT trip_key) AS BIGINT) AS n_trips,
        count(*) AS n_rows
      FROM t GROUP BY 1"""))

  /** G5 — proportional allocation within a trip: each trip's wall-clock
    * duration is allocated to its legs proportional to leg weight
    * (HwyNetwork.py:569-610 allocates observed travel time to path links
    * by free-flow share) — relational form: two windows, no mapGroups. */
  val q56Allocation = Q(
    "q56_allocation",
    (s, d) => {
      val g = Window.partitionBy(col("user_id"), col("trip_id"))
      Windows.sessionize(events(s, d), Seq("user_id"), "ts", Seq("event_id"),
          gapMinutes = 60.0, sessionCol = "trip_id")
        .withColumn("dur_s",
          // TIMESTAMP_NTZ can't cast straight to double; go via timestamp
          // (identity when already TIMESTAMP, wall-clock no-op under UTC)
          max(col("ts").cast("timestamp").cast("double")).over(g) -
            min(col("ts").cast("timestamp").cast("double")).over(g))
        .withColumn("__sumv",
          sum(col("value").cast("decimal(18,6)")).over(g).cast("double"))
        .withColumn("alloc_s",
          when(col("__sumv") =!= 0, col("dur_s") * col("value") / col("__sumv")))
        .groupBy("user_id", "trip_id")
        .agg(count(lit(1)).as("n_legs"),
          round(sum("alloc_s"), 4).as("alloc_total_s"),
          round(max("dur_s"), 4).as("dur_s"),
          round(max("alloc_s"), 4).as("max_leg_alloc_s"))
    },
    Some("""WITH b AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) >= 3600
               THEN 1 ELSE 0 END AS is_break
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (
        SELECT user_id, ts, value,
          CAST(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS trip_id
        FROM b),
      a AS (
        SELECT user_id, trip_id, value,
          max(epoch(ts)) OVER g - min(epoch(ts)) OVER g AS dur_s,
          CASE WHEN CAST(sum(CAST(value AS DECIMAL(18,6))) OVER g AS DOUBLE) <> 0
            THEN (max(epoch(ts)) OVER g - min(epoch(ts)) OVER g)
              * value / CAST(sum(CAST(value AS DECIMAL(18,6))) OVER g AS DOUBLE)
          END AS alloc_s
        FROM t WINDOW g AS (PARTITION BY user_id, trip_id))
      SELECT user_id, trip_id, count(*) AS n_legs,
        round(sum(alloc_s), 4) AS alloc_total_s,
        round(max(dur_s), 4) AS dur_s,
        round(max(alloc_s), 4) AS max_leg_alloc_s
      FROM a GROUP BY 1, 2"""))

  /** §7.2 item 7 — the demand-driver assembly pipeline end-to-end
    * (annual anchors → monthly interpolation → weighted regional rollup →
    * step-fill + CPI deflation). The oracle rebuilds the formula-generated
    * fixture independently in SQL. */
  val q57DemandAssembly = Q(
    "q57_demand_assembly",
    (s, _) => graft.pipelines.Demand.assemble(s),
    Some("""WITH months AS (
        SELECT k, TIMESTAMP '2010-07-01' + to_months(CAST(k AS INT)) AS month,
          100.0 + 0.25 * k AS CPI,
          CASE WHEN k % 5 = 2 THEN NULL ELSE 3.0 + 0.01 * k END AS FUEL
        FROM range(0, 49) t(k)),
      counties AS (SELECT 'F' || c AS FIPS FROM range(0, 3) t(c)),
      anchors AS (
        SELECT 'F' || c AS FIPS,
          CAST(('' || y || '-07-01') AS TIMESTAMP) AS month,
          1000.0 * (c + 1) + 60.0 * (y - 2010) * (c + 1) AS POP,
          50000.0 + 1000.0 * c + 500.0 * (y - 2010) AS MEDHHINC
        FROM range(0, 3) t(c), range(2010, 2015) u(y)),
      spine AS (
        SELECT co.FIPS, m.month, year(m.month) * 12 + month(m.month) AS idx
        FROM months m CROSS JOIN counties co),
      j AS (
        SELECT s.FIPS, s.month, s.idx, a.POP, a.MEDHHINC
        FROM spine s LEFT JOIN anchors a ON s.FIPS = a.FIPS AND s.month = a.month),
      w AS (
        SELECT FIPS, month, CAST(idx AS DOUBLE) AS t, POP, MEDHHINC,
          last_value(POP IGNORE NULLS) OVER past AS ppv,
          last_value(CASE WHEN POP IS NOT NULL THEN CAST(idx AS DOUBLE) END IGNORE NULLS) OVER past AS ppt,
          first_value(POP IGNORE NULLS) OVER fut AS pnv,
          first_value(CASE WHEN POP IS NOT NULL THEN CAST(idx AS DOUBLE) END IGNORE NULLS) OVER fut AS pnt,
          last_value(MEDHHINC IGNORE NULLS) OVER past AS ipv,
          last_value(CASE WHEN MEDHHINC IS NOT NULL THEN CAST(idx AS DOUBLE) END IGNORE NULLS) OVER past AS ipt,
          first_value(MEDHHINC IGNORE NULLS) OVER fut AS inv,
          first_value(CASE WHEN MEDHHINC IS NOT NULL THEN CAST(idx AS DOUBLE) END IGNORE NULLS) OVER fut AS int_
        FROM j
        WINDOW past AS (PARTITION BY FIPS ORDER BY idx ROWS UNBOUNDED PRECEDING),
               fut AS (PARTITION BY FIPS ORDER BY idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      interp AS (
        SELECT FIPS, month,
          COALESCE(POP, CASE WHEN ppv IS NOT NULL AND pnv IS NOT NULL
            THEN ppv + (pnv - ppv) * (t - ppt) / (pnt - ppt) END, ppv, pnv) AS POP_M,
          COALESCE(MEDHHINC, CASE WHEN ipv IS NOT NULL AND inv IS NOT NULL
            THEN ipv + (inv - ipv) * (t - ipt) / (int_ - ipt) END, ipv, inv) AS INC_M
        FROM w),
      regional AS (
        SELECT month, sum(POP_M) AS POP,
          sum(POP_M * INC_M) / sum(POP_M) AS MEDHHINC
        FROM interp GROUP BY 1),
      fuelf AS (
        SELECT month, CPI,
          last_value(FUEL IGNORE NULLS) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS FUEL
        FROM months)
      SELECT r.month, round(r.POP, 4) AS POP,
        round(r.MEDHHINC * (100.0 / f.CPI), 4) AS MEDHHINC_2010USD,
        round(f.FUEL * (100.0 / f.CPI), 6) AS FUEL_2010USD
      FROM regional r LEFT JOIN fuelf f ON r.month = f.month"""))

  /** G2/G3 — the reference's skim pattern: dense all-pairs costs
    * precomputed ONCE on the driver (the graph is a config artifact, like
    * HwyNetwork.py:227-294), shipped as a broadcast-joinable table, probed
    * per fact row. Edge cost = 1 + dst%3 on the nation chain; probe = cost
    * from each nation's region root to the nation. Oracle recomputes the
    * paths with a recursive CTE. */
  val q58SkimProbe = Q(
    "q58_skim_probe",
    (s, d) => {
      import s.implicits._
      val nat = nation(s, d)
      val w = Window.partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
      // tiny config graph -> driver, per the reference; the take(N+1) bound
      // turns a fact-sized edge set into a loud error instead of a silent
      // driver OOM
      val maxEdges = 100000
      val edgeRows = nat.withColumn("dst", lead(col("n_nationkey"), 1).over(w))
        .where(col("dst").isNotNull)
        .select(col("n_nationkey").cast("int").as("src"), col("dst").cast("int").as("dst"))
        .as[(Int, Int)].take(maxEdges + 1)
      require(edgeRows.length <= maxEdges,
        s"q58 skim expects a config-scale graph; got > $maxEdges edges")
      val edges = edgeRows.map { case (u, v) => (u, v, 1.0 + v % 3) }
      val n = 32
      val (dist, _) = graft.graph.Graph.floydWarshall(n, edges.toSeq)
      val skim = (for {
        i <- 0 until n; j <- 0 until n
        if i != j && dist(i)(j) < Double.MaxValue / 8
      } yield (i, j, dist(i)(j))).toDF("src", "dst", "cost")
      val roots = nat.groupBy("n_regionkey").agg(min("n_nationkey").as("root"))
      nat.join(roots, "n_regionkey")
        .join(broadcast(skim),
          col("root") === col("src") && col("n_nationkey") === col("dst"), "left")
        .select(col("n_nationkey").cast("long").as("nation"),
          col("root").cast("long").as("root"),
          round(coalesce(col("cost"), lit(0.0)), 4).as("cost_from_root"))
    },
    Some("""WITH RECURSIVE e AS (
        SELECT n_nationkey AS src,
          lead(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS dst
        FROM nation),
      e2 AS (SELECT src, dst, 1.0 + dst % 3 AS w FROM e WHERE dst IS NOT NULL),
      roots AS (SELECT n_regionkey, min(n_nationkey) AS root FROM nation GROUP BY 1),
      walk AS (
        SELECT src AS root, dst AS node, w AS cost FROM e2
        UNION ALL
        SELECT wk.root, e2.dst, wk.cost + e2.w FROM walk wk JOIN e2 ON wk.node = e2.src),
      best AS (SELECT root, node, min(cost) AS cost FROM walk GROUP BY 1, 2)
      SELECT CAST(n.n_nationkey AS BIGINT) AS nation,
        CAST(r.root AS BIGINT) AS root,
        round(COALESCE(b.cost, 0.0), 4) AS cost_from_root
      FROM nation n JOIN roots r ON n.n_regionkey = r.n_regionkey
      LEFT JOIN best b ON b.root = r.root AND b.node = n.n_nationkey"""))

  /** O7 — set intersection (absent in the reference; native here). */
  val q59SetOps = Q(
    "q59_set_ops",
    (s, d) =>
      customer(s, d).select(col("c_custkey").as("key"))
        .intersect(supplier(s, d).select(col("s_suppkey").as("key"))),
    Some("""SELECT c_custkey AS key FROM customer
      INTERSECT SELECT s_suppkey FROM supplier"""))

  /** BPE-ish subword token counting (letter runs / digit runs / symbols) —
    * the pre-tokenizer shape of byte-pair encoders; identical regex
    * semantics across Java regex and RE2. */
  val q60BpeTokens = Q(
    "q60_bpe_tokens",
    (s, d) =>
      documents(s, d)
        .withColumn("n_sub", size(Text.subwordTokens(col("text"))).cast("long"))
        .groupBy("lang")
        .agg(sum("n_sub").as("total_subwords"),
          round(avg("n_sub"), 4).as("avg_subwords"),
          count(lit(1)).as("n_docs")),
    Some("""SELECT lang,
        CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_subwords,
        round(avg(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))), 4) AS avg_subwords,
        count(*) AS n_docs
      FROM documents GROUP BY 1"""))

  /** Winnowing document fingerprints (rolling-hash k-grams, sliding-window
    * minima): per-doc fingerprint count and smallest fingerprint —
    * the SIGMOD'03 scheme whose guarantee is that any shared substring of
    * length >= k+w-1 produces a shared fingerprint. */
  val q61Winnow = Q(
    "q61_winnow",
    (s, d) => {
      // staged: each heavy array (chars -> gram hashes) materializes
      // behind an exchange so the next fold reads a bound attribute
      // (see Text.winnowFromHashes)
      val chars = documents(s, d)
        .select(col("doc_id"),
          split(Text.normalize(col("text")), "").as("chars"))
        .repartition(col("doc_id"))
      val hashed = chars
        .select(col("doc_id"),
          transform(Text.charShinglesFrom(col("chars"), 8),
            g => Text.md5Hash64(g, 0)).as("h"))
        .repartition(col("doc_id"))
      hashed.select(col("doc_id"),
          Text.winnowFromHashes(col("h"), w = 4).as("fp"))
        .select(col("doc_id"),
          size(col("fp")).cast("long").as("n_fingerprints"),
          array_min(col("fp")).as("min_fingerprint"))
    },
    Some("""WITH norm AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        FROM documents),
      grams AS (
        SELECT doc_id,
          CASE WHEN length(t) >= 8
            THEN list_transform(generate_series(1, length(t) - 7),
              i -> ('0x' || substr(md5('0:' || substr(t, CAST(i AS INT), 8)), 1, 15))::BIGINT)
            ELSE CAST([] AS BIGINT[]) END AS h
        FROM norm),
      mins AS (
        SELECT doc_id,
          CASE WHEN len(h) >= 4
            THEN list_distinct(list_transform(generate_series(1, len(h) - 3),
              i -> least(h[CAST(i AS INT)], h[CAST(i AS INT) + 1],
                         h[CAST(i AS INT) + 2], h[CAST(i AS INT) + 3])))
            ELSE CAST([] AS BIGINT[]) END AS fp
        FROM grams)
      SELECT doc_id, CAST(len(fp) AS BIGINT) AS n_fingerprints,
        list_min(fp) AS min_fingerprint
      FROM mins"""))

  /** Embedding centroids per label: elementwise mean via posexplode +
    * two-level aggregation (the shuffle-backed path that scales to any
    * vector count), reporting the centroid norm. */
  val q62Centroids = Q(
    "q62_centroids",
    (s, d) => {
      val e = embeddings(s, d)
      val byDim = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos")
        .agg(avg(col("v").cast("double")).as("cv"))
      val norms = byDim.groupBy("label")
        .agg(round(sqrt(sum(col("cv") * col("cv"))), 6).as("centroid_norm"))
      val counts = e.groupBy("label").agg(count(lit(1)).as("n_vecs"))
      counts.join(norms, Seq("label"))
        .select(col("label").cast("long").as("label"),
          col("n_vecs"), col("centroid_norm"))
    },
    Some("""WITH idx AS (
        SELECT label, embedding,
          unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings),
      dims AS (
        SELECT label, pos,
          avg(CAST(embedding[CAST(pos AS INT)] AS DOUBLE)) AS cv
        FROM idx GROUP BY 1, 2),
      norms AS (
        SELECT label, round(sqrt(sum(cv * cv)), 6) AS centroid_norm
        FROM dims GROUP BY 1),
      counts AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1)
      SELECT CAST(c.label AS BIGINT) AS label, c.n_vecs, n.centroid_norm
      FROM counts c JOIN norms n ON c.label = n.label"""))

  /** Int8 embedding quantization (the storage/serving compression step of
    * an embedding pipeline): symmetric scale by max |v|, round to [-127,
    * 127], report reconstruction error. Pure array expressions. */
  val q63Quantize = Q(
    "q63_quantize",
    (s, d) => {
      val e = embeddings(s, d)
        .withColumn("maxabs",
          aggregate(col("embedding"), lit(0.0d),
            (acc, v) => greatest(acc, abs(v.cast("double")))))
      val q = e.withColumn("quant",
          transform(col("embedding"),
            v => round(v.cast("double") / col("maxabs") * 127.0, 0).cast("int")))
        .withColumn("mse",
          aggregate(
            zip_with(col("embedding"), col("quant"),
              (v, qq) => pow(v.cast("double") - qq.cast("double") * col("maxabs") / 127.0, 2)),
            lit(0.0d), (acc, x) => acc + x) / size(col("embedding")))
      q.groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg("maxabs"), 6).as("avg_maxabs"),
          round(avg("mse"), 9).as("avg_mse"))
        .select(col("label").cast("long").as("label"), col("n"),
          col("avg_maxabs"), col("avg_mse"))
    },
    Some("""WITH q AS (
        SELECT label,
          list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS maxabs,
          embedding
        FROM embeddings),
      m AS (
        SELECT label, maxabs,
          list_sum(list_transform(embedding,
            v -> power(CAST(v AS DOUBLE)
              - round(CAST(v AS DOUBLE) / maxabs * 127.0)
                * maxabs / 127.0, 2))) / len(embedding) AS mse
        FROM q)
      SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
        round(avg(maxabs), 6) AS avg_maxabs,
        round(avg(mse), 9) AS avg_mse
      FROM m GROUP BY 1"""))

  /** Semi-structured JSON property extraction (events.props is a JSON
    * string): schema-on-read with from_json, grouped rollup on the parsed
    * field — the props-column pattern of event pipelines. */
  val q64JsonProps = Q(
    "q64_json_props",
    (s, d) =>
      events(s, d)
        .withColumn("k",
          from_json(col("props"), lit("k BIGINT")).getField("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"),
          round(avg("value"), 4).as("avg_value"),
          max("k").as("max_k")),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        count(*) AS n, round(avg(value), 4) AS avg_value,
        max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY 1"""))

  /** The spark.sql entry point: ONE ANSI SQL text (TPC-H Q5 shape — a
    * 6-way join across the full star schema) runs verbatim on both Spark
    * SQL and DuckDB. Tables are registered as temp views from the sf dir. */
  val q5SqlText = """SELECT r_name AS region, CAST(year(o_orderdate) AS BIGINT) AS yr,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2"""

  val q65SqlInterface = Q(
    "q65_sql_interface",
    (s, d) => {
      val views = Seq("region", "nation", "customer", "supplier", "orders", "lineitem")
      views.foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
      // Dataset analysis is eager, so the view references are resolved to
      // plans here; dropping the views right after keeps the shared
      // session's namespace clean (no stale tables shadowing later sql())
      val df = s.sql(q5SqlText)
      views.foreach(s.catalog.dropTempView)
      df
    },
    Some(q5SqlText))

  /** §3.3 estimation file + E14 data patches: the model-input assembly
    * (writeSFMuniEstimationFile, TransitReporter.py:2059-2099) — monthly
    * measures joined with explicit event-dummy columns and a targeted
    * hand-patch (the reference pins known data problems to specific months,
    * e.g. the BART-strike dummies and the Dec-2009 fill). */
  val q66EstimationFile = Q(
    "q66_estimation_file",
    (s, d) => {
      val monthly = orders(s, d)
        .groupBy(date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      monthly
        // E14-style targeted patch: a known-bad month is overridden by a
        // documented ratio adjustment
        .withColumn("revenue_patched",
          when(col("month") === lit("1997-07-01").cast("timestamp"),
            col("revenue") * 1.1).otherwise(col("revenue")))
        // event dummies for estimation
        .withColumn("strike_dummy",
          (col("month") === lit("1997-07-01").cast("timestamp")).cast("int"))
        .withColumn("post2000_dummy", (year(col("month")) >= 2000).cast("int"))
        .withColumn("trend",
          (year(col("month")) * 12 + month(col("month")) - lit(1995 * 12 + 1)).cast("long"))
        .select(col("month"), round(col("revenue_patched"), 2).as("revenue_patched"),
          col("n_orders"), col("strike_dummy"), col("post2000_dummy"), col("trend"))
    },
    Some("""WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS month,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
          count(*) AS n_orders
        FROM orders GROUP BY 1)
      SELECT month,
        round(CASE WHEN month = TIMESTAMP '1997-07-01' THEN revenue * 1.1
              ELSE revenue END, 2) AS revenue_patched,
        n_orders,
        CAST(CASE WHEN month = TIMESTAMP '1997-07-01' THEN 1 ELSE 0 END AS INT) AS strike_dummy,
        CAST(CASE WHEN year(month) >= 2000 THEN 1 ELSE 0 END AS INT) AS post2000_dummy,
        CAST(year(month) * 12 + month(month) - 23941 AS BIGINT) AS trend
      FROM m"""))

  /** T7 — ratio-based extrapolation (MultiModalHelper.py:216-238): where a
    * trusted series (lineitem revenue) has gaps, estimate it from a proxy
    * series (orders revenue) scaled by the observed ratio, forward- AND
    * backward-filled to cover leading/trailing gaps. */
  val q67RatioExtrapolation = Q(
    "q67_ratio_extrapolation",
    (s, d) => {
      val o = orders(s, d)
        .groupBy(date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(dsum(col("o_totalprice")).as("proxy"))
      val li = lineitem(s, d)
        .groupBy(date_trunc("MONTH", col("l_shipdate")).as("month"))
        .agg(round(sum(revDec), 2).cast("double").as("trusted"))
      // deterministic knockout: trusted missing every 4th month
      val joined = o.join(li, Seq("month"), "left")
        .withColumn("trusted_obs",
          when(month(col("month")) % 4 === 0, lit(null)).otherwise(col("trusted")))
        .withColumn("ratio", col("trusted_obs") / col("proxy"))
      val wAll = Window.partitionBy(Guards.constKey(col("month"))).orderBy(col("month"))
      val filled = joined
        .withColumn("ratio_f",
          Guards.bounded(coalesce(
            last(col("ratio"), ignoreNulls = true)
              .over(wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            first(col("ratio"), ignoreNulls = true)
              .over(wAll.rowsBetween(Window.currentRow, Window.unboundedFollowing))),
            col("month"), "q67 monthly ratio spine"))
      filled.select(col("month"),
        round(coalesce(col("trusted_obs"), col("proxy") * col("ratio_f")), 2)
          .as("trusted_extrapolated"),
        (col("trusted_obs").isNull).cast("int").as("extrapolated"))
    },
    Some("""WITH o AS (
        SELECT date_trunc('month', o_orderdate) AS month,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS proxy
        FROM orders GROUP BY 1),
      li AS (
        SELECT date_trunc('month', l_shipdate) AS month,
          CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1.00 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS trusted
        FROM lineitem GROUP BY 1),
      j AS (
        SELECT o.month, o.proxy,
          CASE WHEN month(o.month) % 4 = 0 THEN NULL ELSE li.trusted END AS trusted_obs
        FROM o LEFT JOIN li ON o.month = li.month),
      r AS (
        SELECT month, proxy, trusted_obs, trusted_obs / proxy AS ratio FROM j),
      f AS (
        SELECT month, proxy, trusted_obs,
          COALESCE(
            last_value(ratio IGNORE NULLS) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING),
            first_value(ratio IGNORE NULLS) OVER (ORDER BY month
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS ratio_f
        FROM r)
      SELECT month,
        round(COALESCE(trusted_obs, proxy * ratio_f), 2) AS trusted_extrapolated,
        CAST(CASE WHEN trusted_obs IS NULL THEN 1 ELSE 0 END AS INT) AS extrapolated
      FROM f"""))

  /** W5 — the FULL 5-predicate taxi trip segmentation
    * (TaxiDataHelper.py:195-320) over a synthetic GPS projection of the
    * events table: status change, long gap, long jump, long stop
    * (forward stationary time), last-point-before-a-stop (backward
    * stationary time) — both stationary times are conditional-reset
    * running sums built with the nested-window trick (see
    * pipelines/Taxi.scala). Thresholds are scaled to this data's
    * inter-event gaps (hours, not GPS seconds); the reference's real
    * constants are the operator defaults and the unit fixture's values.
    * All five predicates fire here (status 3099 / gap 710 / dist 1052 /
    * fwd-stat 776 / bwd-stat 366 breaks at sf0.01). */
  val q68TaxiSegmentation = Q(
    "q68_taxi_segmentation",
    (s, d) => {
      val pts = events(s, d).select(
        col("user_id"), col("ts"), col("event_id"),
        (col("value") * 100.0).as("x"),
        ((col("event_id") % 97) * 50.0).as("y"),
        when(col("event_type") === "purchase", "metered")
          .otherwise("empty").as("status"))
      val seg = graft.pipelines.Taxi.segmentPoints(
        pts, Seq("user_id"), "ts", "event_id", "x", "y", "status",
        speedThresholdMph = 0.10, stationarySeconds = 100000.0,
        maxSecondsBetween = 86400.0, maxFeetBetween = 9000.0)
      graft.pipelines.Taxi.toTrips(seg, Seq("user_id"), "ts",
          minTripFeet = 2000.0)
        .select(col("user_id"), col("trip_id"), col("num_points"),
          round(col("trip_length"), 2).as("trip_length"),
          col("start_ts"), col("end_ts"))
    },
    Some("""WITH pts AS (
        SELECT user_id, ts, event_id,
          value * 100.0 AS x,
          (event_id % 97) * 50.0 AS y,
          CASE WHEN event_type = 'purchase' THEN 'metered' ELSE 'empty' END AS status
        FROM events),
      m AS (
        SELECT user_id, ts, event_id, status,
          epoch(ts) - epoch(lag(ts) OVER w) AS seconds,
          sqrt(pow(x - lag(x) OVER w, 2) + pow(y - lag(y) OVER w, 2)) AS feet,
          CASE WHEN lag(status) OVER w IS NOT NULL AND status <> lag(status) OVER w
               THEN 1 ELSE 0 END AS status_chg
        FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sp AS (
        SELECT *, CASE WHEN seconds > 0 THEN feet / seconds * 0.681818 END AS speed
        FROM m),
      fg AS (
        SELECT *,
          CASE WHEN seconds IS NULL OR seconds = 0 OR speed >= 0.10
               THEN 1 ELSE 0 END AS fwd_reset,
          sum(CASE WHEN seconds IS NULL OR seconds = 0 OR speed >= 0.10
               THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS fwd_grp
        FROM sp),
      fs AS (
        SELECT *,
          COALESCE(sum(CASE WHEN fwd_reset = 0 THEN seconds END)
            OVER (PARTITION BY user_id, fwd_grp ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING), 0) AS fst
        FROM fg),
      ld AS (
        SELECT *,
          lead(seconds) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2,
          lead(speed) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sp2
        FROM fs),
      bg AS (
        SELECT *,
          CASE WHEN s2 IS NULL OR s2 = 0 OR sp2 >= 0.10 THEN 1 ELSE 0 END AS bwd_reset,
          sum(CASE WHEN s2 IS NULL OR s2 = 0 OR sp2 >= 0.10 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                  ROWS UNBOUNDED PRECEDING) AS bwd_grp
        FROM ld),
      bs AS (
        SELECT *,
          COALESCE(sum(CASE WHEN bwd_reset = 0 THEN s2 END)
            OVER (PARTITION BY user_id, bwd_grp ORDER BY ts DESC, event_id DESC
                  ROWS UNBOUNDED PRECEDING), 0) AS bst
        FROM bg),
      brk AS (
        SELECT *,
          CASE WHEN seconds IS NULL OR status_chg = 1 OR seconds > 86400.0
            OR feet > 9000.0 OR fst > 100000.0
            OR (bst > 100000.0 AND fst > 0) THEN 1 ELSE 0 END AS is_break
        FROM bs),
      tr AS (
        SELECT user_id, ts, event_id, COALESCE(feet, 0) AS feet0,
          CAST(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS trip_id
        FROM brk)
      SELECT user_id, trip_id, count(*) AS num_points,
        round(sum(feet0), 2) AS trip_length,
        min(ts) AS start_ts, max(ts) AS end_ts
      FROM tr GROUP BY 1, 2
      HAVING count(*) > 1 AND sum(feet0) > 2000.0"""))

  /** The map-matching fixture: a directed network in two disconnected
    * components and three GPS trips. Planted so every stage is
    * hand-derivable — see MapMatchSpec for the full worked derivation.
    * Component A (links 1-5, two routes B->D): trip 1's second point sits
    * closer to the wrong link (link 4, 80 ft vs 120 ft); the path
    * structure snaps it back to link 2, which is the entire point of HMM
    * map-matching. Component B (links 21-26, a sharp 45° bulge vs a
    * shallow 14° bulge between the same nodes): free-flow alone would
    * route trip 3 over the sharp bulge (90 s vs 154 s), but its two 45°
    * turns + the 45° merge cost 70 s of penalties vs 0 for the
    * through-graded shallow bulge (204 < 210) — the turn-discriminating
    * case VERDICT r4 asked for. The skim is the PENALIZED one throughout
    * (HwyNetwork.py:129-141,257-276). */
  private lazy val mmLinks = Seq(
    graft.pipelines.MapMatch.Link(1L, 0, 0, 1000, 0, 50),
    graft.pipelines.MapMatch.Link(2L, 1000, 0, 2000, 0, 50),
    graft.pipelines.MapMatch.Link(3L, 2000, 0, 2000, 1000, 100),
    graft.pipelines.MapMatch.Link(4L, 1000, 0, 1000, 1000, 100),
    graft.pipelines.MapMatch.Link(5L, 1000, 1000, 2000, 1000, 100),
    graft.pipelines.MapMatch.Link(21L, 10000, 0, 11000, 0, 50),
    graft.pipelines.MapMatch.Link(22L, 11000, 0, 11500, 500, 20),
    graft.pipelines.MapMatch.Link(23L, 11500, 500, 12000, 0, 20),
    graft.pipelines.MapMatch.Link(24L, 11000, 0, 11500, 125, 52),
    graft.pipelines.MapMatch.Link(25L, 11500, 125, 12000, 0, 52),
    graft.pipelines.MapMatch.Link(26L, 12000, 0, 13000, 0, 50))
  private lazy val mmSkim = graft.pipelines.MapMatch.linkSkimPenalized(
    mmLinks, graft.pipelines.MapMatch.geometricMovements(mmLinks))
  private lazy val mmById = mmLinks.map(l => l.linkId -> l).toMap

  private def mmTraversals(s: SparkSession) = {
    import s.implicits._
    val pts = Seq(
      ("1", 0L, 0.0, 600.0, 10.0), ("1", 1L, 96.0, 1080.0, 120.0),
      ("1", 2L, 156.0, 1900.0, 40.0), ("1", 3L, 276.0, 2050.0, 950.0),
      ("2", 0L, 1000.0, 200.0, 5.0), ("2", 1L, 1100.0, 1800.0, 5.0),
      ("2", 2L, 1150.0, 1800.0, 5.0), // stationary repeat: leg is skipped
      ("3", 0L, 2000.0, 10600.0, 10.0), ("3", 1L, 2154.0, 12600.0, 10.0)
    ).toDF("trip", "pt", "ts", "x", "y")
    val cands = graft.pipelines.MapMatch.candidateStates(
      pts, mmLinks, "trip", "pt", "x", "y")
    val legs = graft.pipelines.MapMatch.viterbiLegs(
      cands, "trip", "pt", "ts", mmSkim, mmById)
    graft.pipelines.MapMatch.allocateTravelTimes(legs, mmLinks)
  }

  /** G1+G3+G4+G5 — the integrated map-matching chain (points ->
    * candidate link projection -> Viterbi over candidate paths from the
    * broadcast PENALIZED skim -> travel time allocated to links with the
    * consecutive-link merge); sftaxi_wrangler.py:172-204 end to end.
    * Oracle = the hand-derived traversals (MapMatchSpec documents the
    * derivation: trip 1 leg ff-parts 20/4, 41, 5/95 allocate dts 96, 60,
    * 120 into exact tts; link 2 merges 0.08+0.82+0.10 across all three
    * legs; trip 3's leg rides the shallow-bulge path 21-24-25-26 that
    * only wins once turn penalties price the sharp bulge). */
  val q69MapMatching = Q(
    "q69_map_matching",
    (s, d) =>
      mmTraversals(s).select(col("trip"), col("run"), col("link_id"),
        round(col("traversal_ratio"), 6).as("traversal_ratio"),
        round(col("travel_time"), 6).as("travel_time"), col("start_ts")),
    Some("""SELECT * FROM (VALUES
        ('1', 1, 1, 0.4,  80.0, TIMESTAMP '1970-01-01 00:00:00'),
        ('1', 2, 2, 1.0,  82.0, TIMESTAMP '1970-01-01 00:01:20'),
        ('1', 3, 3, 0.95, 114.0, TIMESTAMP '1970-01-01 00:02:42'),
        ('2', 1, 1, 0.8,  50.0, TIMESTAMP '1970-01-01 00:16:40'),
        ('2', 2, 2, 0.8,  50.0, TIMESTAMP '1970-01-01 00:17:30'),
        ('3', 1, 21, 0.4, 20.0, TIMESTAMP '1970-01-01 00:33:20'),
        ('3', 2, 24, 1.0, 52.0, TIMESTAMP '1970-01-01 00:33:40'),
        ('3', 3, 25, 1.0, 52.0, TIMESTAMP '1970-01-01 00:34:32'),
        ('3', 4, 26, 0.6, 30.0, TIMESTAMP '1970-01-01 00:35:24'))
      t(trip, run, link_id, traversal_ratio, travel_time, start_ts)"""))

  /** A10 over the matched traversals — link travel-time stats on
    * mostly-traversed observations (ratio > 0.75), scaled to the full
    * link (TaxiDataHelper.py:489-541): link 1 gets trip 2's 62.5 s,
    * link 2 one 82 s and one 62.5 s observation (pop-std 9.75, p95
    * 81.025), link 3 trip 1's 114/0.95 = 120 s, links 24/25 trip 3's
    * full 52 s traversals; the 0.4/0.6 partial traversals are filtered
    * out. */
  val q70LinkTtStats = Q(
    "q70_link_tt_stats",
    (s, d) =>
      graft.pipelines.MapMatch.linkStats(mmTraversals(s))
        .select(col("link_id"), col("hour"), col("observations"),
          round(col("tt_mean"), 6).as("tt_mean"),
          round(col("tt_std"), 6).as("tt_std"),
          round(col("tt_95"), 6).as("tt_95")),
    Some("""SELECT * FROM (VALUES
        (1, 0, 1, 62.5,  0.0,  62.5),
        (2, 0, 2, 72.25, 9.75, 81.025),
        (3, 0, 1, 120.0, 0.0,  120.0),
        (24, 0, 1, 52.0, 0.0,  52.0),
        (25, 0, 1, 52.0, 0.0,  52.0))
      t(link_id, hour, observations, tt_mean, tt_std, tt_95)"""))

  /** Expected per-stop GTFS measures, computed independently in plain
    * Scala with the same IEEE arithmetic and decimal rounding
    * (BigDecimal.valueOf == Spark's Round semantics): service-mile deltas
    * from the shape distances, runtimes, speeds. */
  private def gtfsRnd(x: Double, d: Int): Double =
    BigDecimal.valueOf(x).setScale(d, BigDecimal.RoundingMode.HALF_UP).toDouble
  private lazy val gtfsStopMiles: Seq[Double] = Seq(
    0.0,
    gtfsRnd(1000 * 3.2808399 / 5280.0, 3),
    gtfsRnd((2500 * 3.2808399 - 1000 * 3.2808399) / 5280.0, 3))
  private lazy val gtfsStopSpeeds: Seq[Double] =
    gtfsStopMiles.zip(Seq(0.0, 4.0, 4.0)).map { case (m, t) =>
      if (t > 0) gtfsRnd(m / (t / 60.0), 2) else 0.0
    }

  /** Daily system-total expectations: WKDY serves t1-t3 on the 10 January
    * weekdays, SAT serves the owl trips t4-t5 (23:55 and 24:40 starts —
    * the >24h service-day trips) on the 2 Saturdays; the SUN service
    * exists in calendar.txt but no trip references it, so Sundays vanish.
    */
  private lazy val gtfsDailyExpected: Seq[(String, Int, Int, Int, Int,
      Double, Double, Double, Double, Double)] = {
    val milesPerTrip = gtfsStopMiles.sum
    val speedSum = gtfsStopSpeeds.sum
    val wkDates = Seq(1, 2, 3, 4, 5, 8, 9, 10, 11, 12)
    val satDates = Seq(6, 13)
    wkDates.map { dd =>
      (f"2024-01-$dd%02d", 1, 3, 3, 9, 2.5, 15.0,
        gtfsRnd(3 * milesPerTrip, 6), 24.0, gtfsRnd(3 * speedSum / 9.0, 6))
    } ++ satDates.map { dd =>
      (f"2024-01-$dd%02d", 2, 2, 3, 6, 3.0, 45.0,
        gtfsRnd(2 * milesPerTrip, 6), 16.0, gtfsRnd(2 * speedSum / 6.0, 6))
    }
  }

  private def gtfsFeedFor(s: SparkSession, base: String) = {
    import graft.sources.Gtfs
    Gtfs.writeZip(s"$base/feed.zip", gtfsFixture)
    Gtfs.extractZip(s"$base/feed.zip", s"$base/feed")
    Gtfs.readFeed(s, s"$base/feed")
  }

  /** S5/W7/A8 — GTFS daily system totals: the full schedule (shape-mile
    * chain with the negative-mile gate, dwell/runtime/speeds, fare join)
    * joined to calendar-expanded service dates, one system row per active
    * date with countUnique trips/stops (GTFSHelper.py:192-282,474-527). */
  val q71GtfsDaily = Q(
    "q71_gtfs_daily",
    (s, d) => {
      import graft.sources.Gtfs
      val feed = gtfsFeedFor(s, graft.sources.Scratch.dir("gtfs71"))
      val sched = Gtfs.assertNonNegativeMiles(Gtfs.tripStopScheduleFull(feed))
      Gtfs.dailySystemTotals(sched, Gtfs.serviceDates(feed))
        .select(col("date").cast("timestamp").as("date"), col("dow"),
          col("TRIPS"), col("STOPS"), col("TRIP_STOPS"),
          round(col("FARE"), 6).as("FARE"),
          round(col("HEADWAY_S"), 6).as("HEADWAY_S"),
          round(col("SERVMILES_S"), 6).as("SERVMILES_S"),
          round(col("RUNTIME_S"), 6).as("RUNTIME_S"),
          round(col("RUNSPEED_S"), 6).as("RUNSPEED_S"))
    },
    Some {
      val rows = gtfsDailyExpected.map { case (dt, dow, tr, st, ts, f, h, sm, rt, sp) =>
        s"(TIMESTAMP '$dt 00:00:00', $dow, $tr, $st, $ts, $f, $h, $sm, $rt, $sp)"
      }.mkString(",\n        ")
      s"""SELECT * FROM (VALUES
        $rows)
        t(date, dow, TRIPS, STOPS, TRIP_STOPS, FARE, HEADWAY_S,
          SERVMILES_S, RUNTIME_S, RUNSPEED_S)"""
    })

  /** A9 — GTFS monthly system totals: means of the daily rows per
    * (month, dow) (GTFSHelper.py:287-321). */
  val q72GtfsMonthly = Q(
    "q72_gtfs_monthly",
    (s, d) => {
      import graft.sources.Gtfs
      val feed = gtfsFeedFor(s, graft.sources.Scratch.dir("gtfs72"))
      val sched = Gtfs.tripStopScheduleFull(feed)
      val daily = Gtfs.dailySystemTotals(sched, Gtfs.serviceDates(feed))
      Gtfs.monthlySystemTotals(daily)
        .select(col("month"), col("dow"),
          round(col("TRIPS"), 6).as("TRIPS"),
          round(col("STOPS"), 6).as("STOPS"),
          round(col("TRIP_STOPS"), 6).as("TRIP_STOPS"),
          round(col("FARE"), 6).as("FARE"),
          round(col("HEADWAY_S"), 6).as("HEADWAY_S"),
          round(col("SERVMILES_S"), 6).as("SERVMILES_S"),
          round(col("RUNTIME_S"), 6).as("RUNTIME_S"),
          round(col("RUNSPEED_S"), 6).as("RUNSPEED_S"))
    },
    Some {
      // means of identical daily rows reduce to those same values
      val wk = gtfsDailyExpected.find(_._2 == 1).get
      val sat = gtfsDailyExpected.find(_._2 == 2).get
      val rows = Seq(wk, sat).map { case (_, dow, tr, st, ts, f, h, sm, rt, sp) =>
        s"(TIMESTAMP '2024-01-01 00:00:00', $dow, $tr.0, $st.0, $ts.0, $f, $h, $sm, $rt, $sp)"
      }.mkString(",\n        ")
      s"""SELECT * FROM (VALUES
        $rows)
        t(month, dow, TRIPS, STOPS, TRIP_STOPS, FARE, HEADWAY_S,
          SERVMILES_S, RUNTIME_S, RUNSPEED_S)"""
    })

  /** A7 — master-route aggregation with NUMDAYS weighting and the
    * missing-month donor patch (SFMuniDataAggregator.py:807-929) on a
    * mid-month-rename fixture: route 5L runs 12 days of April 2015, its
    * rename 5R the other 18 — both map to master route 5, so trips SUM
    * (no double count) and ON/ONTIME5 weight by days; the 8X's December
    * row aggregated all-null (missing data) and is filled from January;
    * route X99 has no equivalency and drops like a pandas NaN group key.
    * Expected (hand-computed): ON(5, Apr) = (12*5000 + 18*9000)/30 = 7400,
    * ONTIME5 = (12*0.8 + 18*0.9)/30 = 0.86. */
  val q73MasterRoute = Q(
    "q73_master_route",
    (s, d) => {
      import s.implicits._
      val monthly = Seq(
        ("2015-04-01", "5L", 12.0, Some(1200.0), Some(5000.0), Some(0.80)),
        ("2015-04-01", "5R", 18.0, Some(2000.0), Some(9000.0), Some(0.90)),
        ("2009-12-01", "8X", 5.0, Option.empty[Double], Option.empty[Double], Option.empty[Double]),
        ("2010-01-01", "8X", 20.0, Some(800.0), Some(3000.0), Some(0.75)),
        ("2015-04-01", "X99", 10.0, Some(99.0), Some(1.0), Some(0.5)))
        .toDF("m", "ROUTE_SHORT_NAME", "NUMDAYS", "TRIPS", "ON", "ONTIME5")
        .withColumn("MONTH", col("m").cast("timestamp")).drop("m")
      val equiv = Seq(("5L", "5"), ("5R", "5"), ("8X", "8"))
        .toDF("ROUTE_SHORT_NAME", "MASTER_ROUTE_NAME")
      val agg = graft.pipelines.Transit.masterRoute(monthly, equiv)
      graft.pipelines.Transit.fillMonthFromDonor(agg,
          Seq("MASTER_ROUTE_NAME"), "MONTH", "2009-12-01", "2010-01-01",
          Seq("TRIPS", "ON", "ONTIME5"))
        .select(col("MONTH"), col("MASTER_ROUTE_NAME"),
          col("NUMDAYS"), col("TRIPS"), round(col("ON"), 6).as("ON"),
          round(col("ONTIME5"), 6).as("ONTIME5"))
    },
    Some("""SELECT * FROM (VALUES
        (TIMESTAMP '2009-12-01 00:00:00', '8', 5.0, 800.0, 3000.0, 0.75),
        (TIMESTAMP '2010-01-01 00:00:00', '8', 20.0, 800.0, 3000.0, 0.75),
        (TIMESTAMP '2015-04-01 00:00:00', '5', 30.0, 3200.0, 7400.0, 0.86))
      t(MONTH, MASTER_ROUTE_NAME, NUMDAYS, TRIPS, "ON", ONTIME5)"""))

  /** T1 full form — annual order counts converted to a monthly series
    * with July anchoring (April for the 1995 "census" year), one-year
    * LINEAR extrapolation at both ends via synthetic anchors, and the
    * Jan(y0)..Dec(yN) trim (DemandHelper.py:1558-1619). The first/last
    * six real months only exist because of the synthetic anchors — a
    * flat-fill implementation hash-mismatches immediately. */
  val q74AnnualToMonthly = Q(
    "q74_annual_to_monthly",
    (s, d) => {
      val annual = orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).cast("double").as("v"))
      TimeSeries.annualToMonthly(annual, Seq.empty, "yr", Seq("v"),
          censusYears = Seq(1995))
        .select(col("month").cast("timestamp").as("month"),
          round(col("v"), 4).as("v"))
    },
    Some("""WITH annual AS (
        SELECT year(o_orderdate) AS yr, CAST(count(*) AS DOUBLE) AS v
        FROM orders GROUP BY 1),
      nb AS (
        SELECT yr, v, lead(v) OVER (ORDER BY yr) AS nx,
          lag(v) OVER (ORDER BY yr) AS pv,
          row_number() OVER (ORDER BY yr) AS rna,
          row_number() OVER (ORDER BY yr DESC) AS rnd
        FROM annual),
      anchors AS (
        SELECT yr, v FROM nb
        UNION ALL SELECT yr - 1, 2*v - nx FROM nb WHERE rna = 1
        UNION ALL SELECT yr + 1, 2*v - pv FROM nb WHERE rnd = 1),
      am AS (
        SELECT make_date(yr, CASE WHEN yr = 1995 THEN 4 ELSE 7 END, 1) AS month, v
        FROM anchors),
      spine AS (
        SELECT unnest(generate_series((SELECT min(month) FROM am),
          (SELECT max(month) FROM am), INTERVAL 1 MONTH))::DATE AS month),
      j AS (
        SELECT s.month, am.v, year(s.month) * 12 + month(s.month) AS idx
        FROM spine s LEFT JOIN am ON s.month = am.month),
      w AS (
        SELECT month, v, CAST(idx AS DOUBLE) AS t,
          last_value(v IGNORE NULLS) OVER past AS pv,
          last_value(CASE WHEN v IS NOT NULL THEN CAST(idx AS DOUBLE) END IGNORE NULLS) OVER past AS pt,
          first_value(v IGNORE NULLS) OVER fut AS nv,
          first_value(CASE WHEN v IS NOT NULL THEN CAST(idx AS DOUBLE) END IGNORE NULLS) OVER fut AS nt
        FROM j
        WINDOW past AS (ORDER BY idx ROWS UNBOUNDED PRECEDING),
               fut AS (ORDER BY idx ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT month::TIMESTAMP AS month,
        round(COALESCE(v,
          CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
               THEN pv + (nv - pv) * (t - pt) / (nt - pt) END,
          pv, nv), 4) AS v
      FROM w
      WHERE month >= make_date((SELECT min(yr) FROM annual), 1, 1)
        AND month <= make_date((SELECT max(yr) FROM annual), 12, 1)"""))

  /** A3/W9 at the reference's month grain (SFMuniDataAggregator.py:
    * 371-464): monthly observed-only aggregates with deterministic
    * knockouts (every month%3==2 unobserved), a store-wide calendar gap
    * (month%7==0 rows deleted — the chain crosses it, because the
    * reference joins the previous AVAILABLE month), and a key dropout
    * ('3-MEDIUM' missing from month%5==0 — ITS chain breaks with null
    * bookkeeping). IMP_TRIP_STOPS telescopes to the anchor month's OBS.
    * MonthImputeSpec proves this window form equals the literal
    * sequential algorithm. */
  val q75MonthImpute = Q(
    "q75_month_impute",
    (s, d) => {
      val monthly = orders(s, d)
        .groupBy(col("o_orderpriority").as("k"),
          date_trunc("MONTH", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"),
          round(dsum(col("o_totalprice")), 2).as("rev0"))
        .withColumn("midx", year(col("month")) * 12 + month(col("month")))
        .where(month(col("month")) % 7 =!= 0 &&
          !(col("k") === "3-MEDIUM" && month(col("month")) % 5 === 0))
        .withColumn("obs",
          when(month(col("month")) % 3 === 2, lit(0L)).otherwise(col("n")))
        .withColumn("rev",
          when(month(col("month")) % 3 === 2, lit(null)).otherwise(col("rev0")))
        .drop("n", "rev0")
      graft.operators.Windows.imputeMonthChain(
          monthly, Seq("k"), "midx", Seq("rev"), "obs")
        .select(col("k"), col("month"), col("obs"),
          round(col("rev"), 4).as("rev"), col("IMP_TRIP_STOPS"))
    },
    Some("""WITH m AS (
        SELECT o_orderpriority AS k, date_trunc('month', o_orderdate) AS month,
          year(o_orderdate) * 12 + month(o_orderdate) AS midx,
          count(*) AS n,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS rev0
        FROM orders GROUP BY 1, 2, 3),
      masked AS (
        SELECT k, month, midx,
          CASE WHEN month(month) % 3 = 2 THEN 0 ELSE n END AS obs,
          CASE WHEN month(month) % 3 = 2 THEN NULL ELSE rev0 END AS rev
        FROM m
        WHERE month(month) % 7 <> 0
          AND NOT (k = '3-MEDIUM' AND month(month) % 5 = 0)),
      rk AS (SELECT *, dense_rank() OVER (ORDER BY midx) AS mrank FROM masked),
      rn AS (SELECT *,
          mrank - row_number() OVER (PARTITION BY k ORDER BY midx) AS run
        FROM rk),
      f AS (
        SELECT k, month, obs,
          CASE WHEN obs > 0 THEN rev
               ELSE last_value(CASE WHEN obs > 0 THEN rev END IGNORE NULLS)
                 OVER (PARTITION BY k, run ORDER BY midx ROWS UNBOUNDED PRECEDING)
          END AS rev,
          last_value(CASE WHEN obs > 0 THEN obs END IGNORE NULLS)
            OVER (PARTITION BY k, run ORDER BY midx ROWS UNBOUNDED PRECEDING) AS anchor,
          min(mrank) OVER (PARTITION BY k, run) AS run0
        FROM rn)
      SELECT k, month, CAST(obs AS BIGINT) AS obs, round(rev, 4) AS rev,
        CAST(CASE WHEN obs > 0 THEN 0
             WHEN anchor IS NOT NULL THEN anchor
             WHEN run0 = 1 THEN 0 END AS BIGINT) AS "IMP_TRIP_STOPS"
      FROM f"""))

  /** K1 under oracle — the partitioned sink round-trip: write monthly
    * aggregates partitioned by year, then REBUILD ONE partition (1996,
    * revenue doubled) through dynamic partition overwrite, re-read and
    * aggregate. The oracle computes yearly revenue with only 1996
    * doubled — a static overwrite (which would drop every other year) or
    * an append (which would double-count 1996) both hash-mismatch, so
    * the remove-key-then-rewrite semantics themselves are what's being
    * checked (SFMuniDataHelper.py:28-39,583-584). */
  val q76PartitionedSink = Q(
    "q76_partitioned_sink",
    (s, d) => {
      val path = graft.sources.Scratch.dir("sink76")
      graft.sources.Sinks.rmrf(path)
      val monthly = orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(round(dsum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
      // ~80 (yr, mo) partitions written, then ONE surgically overwritten
      // (GTFSHelper.py:169-171's remove-key-then-append): dynamic
      // partition overwrite must replace exactly the partitions present
      // in the patch frame. If it clobbered the other ~79, the read-back
      // aggregate below would collapse to the patch and hash-mismatch
      // the oracle; file-level byte stability of untouched partitions is
      // asserted in SinksStreamingSpec.
      graft.sources.Sinks.writePartitioned(monthly, path, Seq("yr", "mo"))
      val patch = monthly.where(col("yr") === 1996 && col("mo") === 6)
        .withColumn("revenue", col("revenue") * 2)
      graft.sources.Sinks.writePartitioned(patch, path, Seq("yr", "mo"))
      s.read.parquet(path)
        .groupBy("yr")
        .agg(round(sum("revenue"), 2).as("revenue"),
          sum("n_orders").as("n_orders"))
    },
    Some("""WITH monthly AS (
        SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
          count(*) AS n_orders
        FROM orders GROUP BY 1, 2)
      SELECT yr,
        round(sum(CASE WHEN yr = 1996 AND mo = 6 THEN revenue * 2 ELSE revenue END), 2) AS revenue,
        CAST(sum(n_orders) AS BIGINT) AS n_orders
      FROM monthly GROUP BY 1"""))

  /** E6 — the mode-inference cascade as a broadcast LOOKUP TABLE
    * (ClipperHelper.py:182-201), not a hard-coded CASE: priority-ordered
    * rules with null-wildcard fields, highest matching priority wins
    * (each np.where in the reference overwrites earlier assignments),
    * default for unmatched rows. The q22 CASE cascade stays as the
    * expression form; this is the data-driven form a config file feeds. */
  val q77ModeLookup = Q(
    "q77_mode_lookup",
    (s, d) => {
      import s.implicits._
      val facts = events(s, d).select(col("event_id"), col("event_type"),
        (col("user_id") % 10).cast("string").as("route"), col("value"))
      val rules = Seq(
        (1, Some("click"), Option.empty[String], "Engagement"),
        (2, Some("purchase"), Option.empty[String], "Revenue"),
        (3, Some("click"), Some("3"), "SpecialClick"),
        (4, Option.empty[String], Some("7"), "Lucky7"))
        .toDF("priority", "etype", "rroute", "mode")
      val cond = (rules("etype").isNull || rules("etype") === facts("event_type")) &&
        (rules("rroute").isNull || rules("rroute") === facts("route"))
      graft.operators.Joins.lookupCascade(facts, Seq("event_id"), rules,
          cond, "priority", "mode", "MODE", lit("Other"))
        .groupBy("MODE")
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
    },
    Some("""WITH f AS (
        SELECT event_id, event_type,
          CAST(user_id % 10 AS VARCHAR) AS route, value
        FROM events),
      r(priority, etype, rroute, mode) AS (
        SELECT * FROM (VALUES
          (1, 'click', NULL, 'Engagement'), (2, 'purchase', NULL, 'Revenue'),
          (3, 'click', '3', 'SpecialClick'), (4, NULL, '7', 'Lucky7'))),
      m AS (
        SELECT f.event_id, min(f.value) AS value,
          max(CASE WHEN r.priority IS NOT NULL
                   THEN struct_pack(p := r.priority, m := r.mode) END) AS best
        FROM f LEFT JOIN r
          ON (r.etype IS NULL OR r.etype = f.event_type)
         AND (r.rroute IS NULL OR r.rroute = f.route)
        GROUP BY f.event_id)
      SELECT COALESCE(best.m, 'Other') AS MODE,
        count(*) AS n, round(avg(value), 4) AS avg_value
      FROM m GROUP BY 1"""))

  /** Near-dup pairs -> connected components -> canonical doc per
    * component: the step that turns MinHash-LSH candidate pairs into
    * dedup DECISIONS (keep the minimum id, drop the rest). Distributed
    * min-label propagation (see Dedup.connectedComponents); the oracle
    * computes the same fixed point as a recursive transitive closure over
    * the identical pair set. */
  val q78DedupComponents = Q(
    "q78_dedup_components",
    (s, d) => {
      val pairs = Dedup.minHashLshPairs(documents(s, d), "doc_id", "text",
        n = 3, numHashes = 32, numBands = 8, threshold = 0.5)
      Dedup.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("component").as("canonical_id"))
    },
    Some(minhashPairsSql +
      """,
      p AS (
        SELECT id1, id2 FROM cand
        WHERE len(list_filter(range(1, 33), i -> m1[i] = m2[i])) / 32.0 >= 0.5),
      e AS (SELECT id1 AS u, id2 AS v FROM p
            UNION SELECT id2, id1 FROM p),
      reach(u, v) AS (
        SELECT u, u FROM e
        UNION
        SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u)
      SELECT u AS doc_id, min(v) AS canonical_id
      FROM reach GROUP BY u"""))

  /** Sequence packing (concat-and-chunk, the standard pretraining batch
    * assembly): documents laid end-to-end per source shard in doc_id
    * order, cut into 256-token sequences; per doc the token offset, the
    * first/last sequence it feeds, and its offset within the first. The
    * cumsum window is per-shard — 1000 shards = 1000 independent tasks,
    * no global sort. */
  val q79SequencePacking = Q(
    "q79_sequence_packing",
    (s, d) =>
      graft.operators.Packing.packSequences(
          documents(s, d).withColumn("n_tokens", Text.tokenCount(col("text"))),
          Seq("source"), "doc_id", "n_tokens", seqLen = 256)
        .select(col("source"), col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("offset"), col("start_seq").cast("long").as("start_seq"),
          col("end_seq").cast("long").as("end_seq"), col("start_offset")),
    Some("""WITH t AS (
        SELECT source, doc_id,
          CASE WHEN text IS NULL
                 OR len(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) = 0 THEN 0
               ELSE len(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
          END AS tok
        FROM documents),
      o AS (
        SELECT source, doc_id, tok,
          CAST(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) - tok AS BIGINT) AS off
        FROM t)
      SELECT source, doc_id, CAST(tok AS BIGINT) AS n_tokens, off AS offset,
        off // 256 AS start_seq,
        CASE WHEN tok > 0 THEN (off + tok - 1) // 256 ELSE off // 256 END AS end_seq,
        off % 256 AS start_offset
      FROM o"""))

  /** Deterministic stratified sampling — the training-data source-mix
    * primitive: per-stratum keep fractions from a broadcast config table,
    * membership decided by an md5-derived hash of the id (reproducible
    * across runs/engines/cluster sizes; no RNG state). src2 is halved,
    * src3 dropped entirely, src1 kept whole, everything else at the
    * default rate. */
  val q80StratifiedSample = Q(
    "q80_stratified_sample",
    (s, d) => {
      import s.implicits._
      val fracs = Seq(("src1", 1.0), ("src2", 0.5), ("src3", 0.0))
        .toDF("source", "frac")
      graft.operators.Packing.stratifiedSample(
          documents(s, d), "doc_id", "source", fracs, defaultFrac = 0.25)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
    },
    Some("""WITH f(source, frac) AS (
        SELECT * FROM (VALUES ('src1', 1.0), ('src2', 0.5), ('src3', 0.0))),
      s AS (
        SELECT d.source, d.n_chars, COALESCE(f.frac, 0.25) AS frac,
          ('0x' || substr(md5('0:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
            % 1000000 AS h
        FROM documents d LEFT JOIN f ON d.source = f.source)
      SELECT source, count(*) AS n_kept,
        CAST(sum(n_chars) AS BIGINT) AS chars_kept
      FROM s WHERE h < frac * 1000000 GROUP BY 1"""))

  /** IVF ANN over the label-mean coarse quantizer (q62's centroids,
    * components rounded to 6dp so the quantizer is engine-exact), nprobe=2:
    * corpus vectors live in their nearest cell, probes search their two
    * nearest cells, exact cosine ranks within the candidates — the
    * FAISS-style scale path where candidate count tracks cell population,
    * not corpus size. */
  val q81IvfAnn = Q(
    "q81_ivf_ann",
    (s, d) => {
      val e = embeddings(s, d)
      val cent = Clustering.labelCentroids(e, "label", "embedding")
      Similarity.ivfTopK(e, e.where(col("vec_id") < 10),
        "vec_id", "embedding", "vec_id", cent, k = 5, nprobe = 2)
    },
    Some("""WITH idx AS (
        SELECT label AS cell, embedding::DOUBLE[] AS ev,
          unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings),
      dims AS (
        SELECT cell, pos,
          round(CAST(sum(CAST(ev[CAST(pos AS INT)] AS DECIMAL(28,12))) AS DOUBLE)
            / count(*), 6) AS cv
        FROM idx GROUP BY 1, 2),
      cent AS (
        SELECT cell, list(cv ORDER BY pos) AS centroid FROM dims GROUP BY 1),
      v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      ca AS (
        SELECT vec_id, e, cell,
          row_number() OVER (PARTITION BY vec_id ORDER BY
            list_sum(list_transform(range(1, len(e) + 1),
              i -> pow(e[i] - centroid[i], 2))), cell) AS cr
        FROM v, cent),
      corpus AS (SELECT vec_id AS neighbor_id, e, cell FROM ca WHERE cr = 1),
      pr AS (SELECT vec_id AS probe_id, e AS pe, cell
             FROM ca WHERE cr <= 2 AND vec_id < 10),
      sc AS (
        SELECT pr.probe_id, c.neighbor_id,
          list_cosine_similarity(c.e, pr.pe) AS cosf
        FROM corpus c JOIN pr ON c.cell = pr.cell
          AND c.neighbor_id <> pr.probe_id),
      rk AS (
        SELECT probe_id, neighbor_id, cosf,
          row_number() OVER (PARTITION BY probe_id
            ORDER BY cosf DESC, neighbor_id) AS rank
        FROM sc)
      SELECT probe_id, rank, neighbor_id, round(cosf, 6) AS cos
      FROM rk WHERE rank <= 5"""))

  /** Repetition quality signals (the Gopher-class filters): type-token
    * ratio and top-bigram share per document, with the repetitive flag a
    * training-data pipeline would filter on. */
  val q82Repetition = Q(
    "q82_repetition",
    (s, d) =>
      Text.repetitionSignals(documents(s, d), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"),
          round(col("ttr"), 6).as("ttr"),
          round(col("top_bigram_share"), 6).as("top_bigram_share"),
          (col("top_bigram_share") > 0.18).cast("int").as("repetitive")),
    Some("""WITH t AS (
        SELECT doc_id,
          string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        FROM documents),
      tk AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
          CASE WHEN len(toks) > 0
               THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
               ELSE 0.0 END AS ttr
        FROM t),
      bg0 AS (
        SELECT doc_id,
          CASE WHEN len(toks) >= 2
            THEN list_transform(generate_series(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i+1])
            ELSE [] END AS bgs
        FROM t),
      bgx AS (SELECT doc_id, unnest(bgs) AS bg FROM bg0),
      bgc AS (SELECT doc_id, bg, count(*) AS c FROM bgx GROUP BY 1, 2),
      bga AS (
        SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS share
        FROM bgc GROUP BY 1)
      SELECT tk.doc_id, tk.n_tokens, round(tk.ttr, 6) AS ttr,
        round(COALESCE(bga.share, 0.0), 6) AS top_bigram_share,
        CAST(COALESCE(bga.share, 0.0) > 0.18 AS INT) AS repetitive
      FROM tk LEFT JOIN bga ON tk.doc_id = bga.doc_id"""))

  /** S7 — the Dynameq-style sectioned network export read into link
    * records: NODES/LINKS sections with `*`-header lines, endpoint
    * coordinates joined from nodes, free-flow seconds derived from
    * length over free-flow speed (HwyNetwork.py:202-224's read +
    * initializeEdgeCostsWithFFTT, re-expressed as a sectioned-text
    * source + two broadcast joins). */
  val q83NetworkIngest = Q(
    "q83_network_ingest",
    (s, d) => {
      val path = graft.sources.Scratch.dir("net83") + "/network_base.dqt"
      new java.io.File(path).getParentFile.mkdirs()
      val text =
        """<DYNAMEQ>
          |<VERSION_1.8>
          |<BASE_NETWORK_FILE>
          |NODES
          |* id x y
          |1 0 0
          |2 2640 0
          |3 5280 0
          |4 2640 2640
          |LINKS
          |* id start end length fspeed
          |1 1 2 0.5 30
          |2 2 3 0.5 15
          |3 2 4 0.5 20
          |4 4 3 0.74 37
          |""".stripMargin
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        text.getBytes("UTF-8"))
      graft.sources.NetworkFile.roadLinks(
          graft.sources.NetworkFile.readSections(s, path))
        .select(col("link_id"), col("ax"), col("ay"), col("bx"), col("by"),
          col("length_mi"), round(col("ff_sec"), 6).as("ff_sec"))
    },
    Some("""SELECT * FROM (VALUES
        (1, 0.0, 0.0, 2640.0, 0.0, 0.5, 60.0),
        (2, 2640.0, 0.0, 5280.0, 0.0, 0.5, 120.0),
        (3, 2640.0, 0.0, 2640.0, 2640.0, 0.5, 90.0),
        (4, 2640.0, 2640.0, 5280.0, 0.0, 0.74, 72.0))
      t(link_id, ax, ay, bx, by, length_mi, ff_sec)"""))

  /** Multimodal frame sampling: the frame grid (ceil(duration/interval)
    * capped) is relational explode over typed metadata; the per-frame
    * decode is the honest stub (16-byte slice checksum). Synthetic
    * metadata: duration_ms = 10 x n_chars. The oracle recomputes every
    * frame's slice checksum from the blob hex. */
  val q84FrameSample = Q(
    "q84_frame_sample",
    (s, d) => {
      val media = documents(s, d).select(col("doc_id").as("id"),
        encode(col("text"), "UTF-8").as("bytes"),
        (col("n_chars") * 10).as("duration_ms"))
      graft.multimodal.Binary.sampleFrames(media, intervalMs = 1000L, maxFrames = 4)
        .toDF()
    },
    Some("""WITH b AS (
        SELECT doc_id, hex(encode(text)) AS hx, n_chars FROM documents),
      g AS (
        SELECT doc_id, hx, len(hx) // 2 AS nb,
          unnest(range(0, CAST(least(ceil(n_chars * 10 / 1000.0), 4) AS BIGINT))) AS idx
        FROM b WHERE ceil(n_chars * 10 / 1000.0) > 0),
      o AS (
        SELECT doc_id, hx, nb, idx, (idx * 16) % nb AS f_off FROM g),
      f AS (
        SELECT doc_id, idx, f_off, least(f_off + 16, nb) AS f_end, hx FROM o)
      SELECT doc_id AS id, CAST(idx AS INT) AS frame_idx,
        idx * 1000 AS ts_ms,
        CAST(f_end - f_off AS INT) AS frame_bytes,
        CAST(COALESCE(list_sum(list_transform(range(f_off, f_end),
            i -> ('0x' || substr(hx, CAST(2 * i + 1 AS INT), 2))::BIGINT)), 0) % 997
          AS BIGINT) AS frame_checksum
      FROM f"""))

  /** PII-style redaction: the documents get deterministic synthetic
    * contact strings appended (the corpus itself is clean word soup),
    * then emails and phone-shaped tokens are scrubbed and counted; the
    * scrubbed text is fingerprinted so the oracle checks the actual
    * replacement output, not just the counts. */
  val q85PiiRedact = Q(
    "q85_pii_redact",
    (s, d) => {
      val emailPat = "[a-z0-9.+-]+@[a-z0-9.-]+"
      val phonePat = "[0-9]{3}-[0-9]{4}"
      val aug = documents(s, d).withColumn("aug",
        concat(col("text"), lit(" contact-"), col("doc_id"), lit("@ex.com ph 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      aug
        .withColumn("n_emails", Text.matchCount(col("aug"), emailPat))
        .withColumn("n_phones", Text.matchCount(col("aug"), phonePat))
        .withColumn("scrubbed",
          Text.redact(Text.redact(col("aug"), emailPat, "[EMAIL]"),
            phonePat, "[PHONE]"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          md5(col("scrubbed")).as("scrubbed_md5"))
    },
    Some("""WITH a AS (
        SELECT doc_id,
          text || ' contact-' || CAST(doc_id AS VARCHAR)
            || '@ex.com ph 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(aug, '[a-z0-9.+-]+@[a-z0-9.-]+')) AS INT) AS n_emails,
        CAST(len(regexp_extract_all(aug, '[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
        md5(regexp_replace(regexp_replace(aug,
          '[a-z0-9.+-]+@[a-z0-9.-]+', '[EMAIL]', 'g'),
          '[0-9]{3}-[0-9]{4}', '[PHONE]', 'g')) AS scrubbed_md5
      FROM a"""))

  /** The dedup loop CLOSED: corpus minus every non-canonical member of a
    * near-dup component (left-anti against the q78 components where the
    * doc is not its component's minimum) — what a user actually ships to
    * training. Reports the kept corpus per source. */
  val q86DedupSweep = Q(
    "q86_dedup_sweep",
    (s, d) => {
      val pairs = Dedup.minHashLshPairs(documents(s, d), "doc_id", "text",
        n = 3, numHashes = 32, numBands = 8, threshold = 0.5)
      val drop = Dedup.connectedComponents(pairs)
        .where(col("id") =!= col("component"))
        .select(col("id").as("doc_id"))
      documents(s, d).join(drop, Seq("doc_id"), "left_anti")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
    },
    Some(minhashPairsSql +
      """,
      p AS (
        SELECT id1, id2 FROM cand
        WHERE len(list_filter(range(1, 33), i -> m1[i] = m2[i])) / 32.0 >= 0.5),
      e AS (SELECT id1 AS u, id2 AS v FROM p
            UNION SELECT id2, id1 FROM p),
      reach(u, v) AS (
        SELECT u, u FROM e
        UNION
        SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
      drop AS (
        SELECT u AS doc_id FROM reach GROUP BY u HAVING u <> min(v))
      SELECT d.source, count(*) AS n_kept,
        CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
      FROM documents d LEFT JOIN drop ON d.doc_id = drop.doc_id
      WHERE drop.doc_id IS NULL
      GROUP BY 1"""))

  /** Shared DuckDB fragment: the whitespace tokenizer as a list column,
    * guarding the ['']-for-empty-string quirk (mirrors Text.tokens). */
  private val duckToksSql =
    """SELECT doc_id,
      CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = '' THEN CAST([] AS VARCHAR[])
           ELSE string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
      END AS toks
    FROM documents"""

  /** Sliding-window token chunking with overlap (64-token chunks every 48
    * tokens) — the pretraining document splitter. Map-only at any scale:
    * the only explode is per-row, there is NO shuffle in this plan. */
  val q87Chunking = Q(
    "q87_chunking",
    (s, d) =>
      graft.operators.Corpus.chunk(documents(s, d), "doc_id", "text",
          chunkTokens = 64, stride = 48)
        .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"),
          col("chunk_text")),
    Some(s"""WITH t AS ($duckToksSql),
      c AS (
        SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start
        FROM t WHERE len(toks) > 0)
      SELECT doc_id, CAST(start // 48 AS INT) AS chunk_id,
        CAST(len(toks[start + 1 : start + 64]) AS INT) AS n_chunk_tokens,
        array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text
      FROM c"""))

  /** Train/test contamination detection: distinct word-8-gram overlap of
    * each test doc (doc_id % 20 == 0) against the train split — the
    * decontamination join. The planted near-duplicates light up as
    * contaminated; clean docs sit near 0. */
  val q88Contamination = Q(
    "q88_contamination",
    (s, d) =>
      graft.operators.Corpus.contamination(documents(s, d), "doc_id", "text",
        col("doc_id") % 20 === 0, n = 8),
    Some(s"""WITH t AS ($duckToksSql),
      s0 AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
        FROM t WHERE len(toks) >= 8),
      s AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i : i + 7], ' ') AS shingle
        FROM s0),
      te AS (SELECT doc_id AS test_id, shingle FROM s WHERE doc_id % 20 = 0),
      tr AS (SELECT shingle, doc_id AS train_id FROM s WHERE doc_id % 20 <> 0),
      tot AS (SELECT test_id, count(*) AS total_ngrams FROM te GROUP BY 1),
      h AS (
        SELECT test_id, count(DISTINCT shingle) AS contaminated_ngrams,
          count(DISTINCT train_id) AS n_contaminating_docs
        FROM te JOIN tr USING (shingle) GROUP BY 1)
      SELECT t.test_id, t.total_ngrams,
        CAST(COALESCE(h.contaminated_ngrams, 0) AS BIGINT) AS contaminated_ngrams,
        CAST(COALESCE(h.n_contaminating_docs, 0) AS BIGINT) AS n_contaminating_docs,
        round(CAST(COALESCE(h.contaminated_ngrams, 0) AS DOUBLE) / t.total_ngrams, 6)
          AS contamination_ratio
      FROM tot t LEFT JOIN h USING (test_id)"""))

  /** Corpus top-K vocabulary + per-doc out-of-vocabulary rate — the
    * vocabulary-coverage quality filter. Top-K = bounded
    * TakeOrderedAndProject broadcast back; per-doc OOV via one exploded
    * left join. */
  val q89VocabOov = Q(
    "q89_vocab_oov",
    (s, d) =>
      graft.operators.Corpus.vocabOov(documents(s, d), "doc_id", "text",
        topK = 20),
    Some(s"""WITH t AS ($duckToksSql),
      w AS (SELECT unnest(toks) AS tok FROM t),
      v AS (SELECT tok FROM w GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 20),
      d AS (SELECT doc_id, unnest(toks) AS tok FROM t),
      j AS (SELECT d.doc_id, d.tok, v.tok AS vt FROM d LEFT JOIN v ON d.tok = v.tok),
      agg AS (
        SELECT doc_id, count(*) AS n_tokens,
          count(CASE WHEN vt IS NULL THEN 1 END) AS oov_tokens
        FROM j GROUP BY 1)
      SELECT t.doc_id,
        CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
        CAST(COALESCE(a.oov_tokens, 0) AS BIGINT) AS oov_tokens,
        CASE WHEN COALESCE(a.n_tokens, 0) > 0
             THEN round(CAST(a.oov_tokens AS DOUBLE) / a.n_tokens, 6)
             ELSE 0.0 END AS oov_ratio
      FROM t LEFT JOIN agg a USING (doc_id)"""))

  /** J4 with NO equi key — overlapping 60-day windows around each order
    * month, lineitems matched purely by ship-date range. The naive plan is
    * a BroadcastNestedLoopJoin (facts x windows); intervalJoinBucketed
    * turns it into a shuffled equi-join on 30-day overlap buckets
    * (PlanQualitySpec's nested-loop canary holds this query to it). */
  val q90IntervalBucketed = Q(
    "q90_interval_bucketed",
    (s, d) => {
      val wins = orders(s, d)
        .select(date_trunc("MONTH", col("o_orderdate")).as("window_month"))
        .distinct()
        .withColumn("start_day", unix_date(col("window_month").cast("date")) - 15)
        .withColumn("end_day", unix_date(col("window_month").cast("date")) + 45)
      val fact = lineitem(s, d)
        .select(unix_date(col("l_shipdate").cast("date")).as("ship_day"),
          revDec.as("r"))
      graft.operators.Joins.intervalJoinBucketed(fact, wins,
          col("ship_day"), col("start_day"), col("end_day"), bucketWidth = 30)
        .groupBy("window_month")
        .agg(count(lit(1)).as("n"),
          round(sum(col("r")), 2).cast("double").as("revenue"))
    },
    Some("""WITH w AS (
        SELECT DISTINCT date_trunc('month', o_orderdate) AS window_month
        FROM orders),
      wd AS (
        SELECT window_month,
          datediff('day', DATE '1970-01-01', CAST(window_month AS DATE)) - 15 AS start_day,
          datediff('day', DATE '1970-01-01', CAST(window_month AS DATE)) + 45 AS end_day
        FROM w),
      f AS (
        SELECT datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS ship_day,
          CAST(l_extendedprice AS DECIMAL(18,2))
            * (1.00 - CAST(l_discount AS DECIMAL(4,2))) AS r
        FROM lineitem)
      SELECT window_month, count(*) AS n,
        CAST(round(sum(r), 2) AS DOUBLE) AS revenue
      FROM f JOIN wd ON f.ship_day >= wd.start_day AND f.ship_day < wd.end_day
      GROUP BY 1"""))

  /** The skew-safe salted join under the oracle: lineitem's 3-value
    * l_returnflag is the canonical skewed key (a third of the fact table
    * per key — one straggler task per key in a plain shuffle join).
    * saltedJoin shards each key across 8 deterministic salt buckets and
    * replicates the dim side. This dim is broadcast-sized (salting exists
    * for when it is NOT and the keys skew); the query pins the machinery's
    * semantics == plain join. */
  val q91SaltedJoin = Q(
    "q91_salted_join",
    (s, d) => {
      import s.implicits._
      val dim = Seq(("A", "accepted"), ("N", "new"), ("R", "returned"))
        .toDF("l_returnflag", "flag_desc")
      graft.operators.Joins.saltedJoin(
          lineitem(s, d).select("l_returnflag", "l_quantity",
            "l_orderkey", "l_linenumber"),
          dim, Seq("l_returnflag"),
          saltFrom = Seq(col("l_orderkey"), col("l_linenumber")), buckets = 8)
        .groupBy("flag_desc")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    },
    Some("""WITH dimt(l_returnflag, flag_desc) AS (
        SELECT * FROM (VALUES
          ('A', 'accepted'), ('N', 'new'), ('R', 'returned')))
      SELECT flag_desc, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN dimt USING (l_returnflag)
      GROUP BY 1"""))

  /** Connected components again, by alternating large-star/small-star
    * contraction (Kiveris et al., SoCC'14) — the O(log n)-round scale
    * path for graphs whose diameter exceeds min-label propagation's
    * round budget (chains, lattices; see Dedup.connectedComponentsStar).
    * Same pair set and the same transitive-closure oracle as q78, so the
    * two algorithms are proven to agree with each other AND with DuckDB's
    * recursive CTE on real candidate data. */
  val q92ComponentsStar = Q(
    "q92_components_star",
    (s, d) => {
      val pairs = Dedup.minHashLshPairs(documents(s, d), "doc_id", "text",
        n = 3, numHashes = 32, numBands = 8, threshold = 0.5)
      Dedup.connectedComponentsStar(pairs)
        .select(col("id").as("doc_id"), col("component").as("canonical_id"))
    },
    Some(minhashPairsSql +
      """,
      p AS (
        SELECT id1, id2 FROM cand
        WHERE len(list_filter(range(1, 33), i -> m1[i] = m2[i])) / 32.0 >= 0.5),
      e AS (SELECT id1 AS u, id2 AS v FROM p
            UNION SELECT id2, id1 FROM p),
      reach(u, v) AS (
        SELECT u, u FROM e
        UNION
        SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u)
      SELECT u AS doc_id, min(v) AS canonical_id
      FROM reach GROUP BY u"""))

  /** One Lloyd round in DuckDB: assignment (argmin of 6-dp-rounded
    * squared L2, ties to the lowest cluster), then per-(cluster, dim)
    * decimal-exact means rounded to 6 dp, empty clusters keeping their
    * previous centroid — the exact recurrence Clustering.kmeansAssign
    * runs, so the two engines stay bit-identical round by round. */
  private def kmeansRoundSql(cPrev: String, n: Int): String = s"""
      a$n AS (
        SELECT p.vec_id,
          min(struct_pack(d := round(list_aggregate(list_transform(range(1, 65),
              i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i])), 'sum'), 6),
            c := c.cid)) AS best
        FROM p CROSS JOIN $cPrev c GROUP BY p.vec_id),
      m$n AS (
        SELECT a.best.c AS cid, d.i,
          round(CAST(sum(CAST(p.v[d.i] AS DECIMAL(28,12))) AS DOUBLE)
            / count(*), 6) AS x
        FROM a$n a JOIN p USING (vec_id), (SELECT unnest(range(1, 65)) AS i) d
        GROUP BY 1, 2),
      c$n AS (
        SELECT c.cid, COALESCE(mm.cv, c.cv) AS cv
        FROM $cPrev c LEFT JOIN
          (SELECT cid, list(x ORDER BY i) AS cv FROM m$n GROUP BY cid) mm
          ON mm.cid = c.cid)"""

  /** One per-subspace-Lloyd PQ training round in DuckDB (m=8 subspaces of
    * 8 dims, 64 total, k=16 codewords) — replays
    * [[graft.operators.Quantization.trainCodebook]] exactly: encode under
    * the previous codebook (`pa`), decimal-exact per-(codeword, dim)
    * means over each dim's OWN subspace rows (`pm`), empty cells keep the
    * previous value (`cb$n`). Expects CTEs `p` (vec_id, v) and `ms`
    * (subspace ids 0..7) in scope. */
  private def pqTrainRoundSql(prev: String, n: Int): String = s"""
      pa$n AS (
        SELECT p.vec_id, ms.m,
          min(struct_pack(d := round(list_aggregate(list_transform(range(1, 9),
              i -> (p.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]) *
                   (p.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])), 'sum'), 6),
            c := cb.k)) AS best
        FROM p CROSS JOIN ms CROSS JOIN $prev cb GROUP BY 1, 2),
      pm$n AS (
        SELECT a.best.c AS k, d.i,
          round(CAST(sum(CAST(p.v[d.i] AS DECIMAL(28,12))) AS DOUBLE)
            / count(*), 6) AS x
        FROM pa$n a JOIN p USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
        WHERE a.m = (d.i - 1) // 8
        GROUP BY 1, 2),
      cb$n AS (
        SELECT cb.k, list(COALESCE(mm.x, cb.cv[d.i]) ORDER BY d.i) AS cv
        FROM $prev cb
        CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
        LEFT JOIN pm$n mm ON mm.k = cb.k AND mm.i = d.i
        GROUP BY cb.k)"""

  /** Deterministic distributed k-means (2 Lloyd rounds, k=8) over the
    * embeddings table — the SemDeDup/topic-bucketing clustering pre-pass.
    * Assignment is a map-side argmin against a literal centroid matrix
    * (no join, no vector shuffle); updates are decimal-exact partial
    * sums. The oracle replays the identical recurrence in DuckDB and the
    * per-vector assignments hash-match. */
  val q93Kmeans = Q(
    "q93_kmeans",
    (s, d) =>
      graft.operators.Clustering.kmeansAssign(
        embeddings(s, d), "vec_id", "embedding", k = 8, iters = 2),
    Some(s"""WITH p AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      k0 AS (SELECT vec_id, v FROM p ORDER BY vec_id LIMIT 8),
      c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
        FROM k0),
      ${kmeansRoundSql("c0", 1)},
      ${kmeansRoundSql("c1", 2)},
      a3 AS (
        SELECT p.vec_id,
          min(struct_pack(d := round(list_aggregate(list_transform(range(1, 65),
              i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i])), 'sum'), 6),
            c := c.cid)) AS best
        FROM p CROSS JOIN c2 c GROUP BY p.vec_id)
      SELECT vec_id, CAST(best.c AS BIGINT) AS cluster FROM a3"""))

  /** Temperature-based source mixing (p_s ~ n_s^alpha, the
    * multilingual-corpus sampling rule): raw share, flattened weight,
    * implied epochs per source at a 1M-row budget. One partial-agg
    * groupBy + a one-row broadcast total. */
  val q94SourceMix = Q(
    "q94_source_mix",
    (s, d) => graft.operators.Packing.temperatureMix(
      documents(s, d), "source", alpha = 0.3, budget = 1000000L),
    Some("""WITH c AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      t AS (SELECT sum(n_docs) AS tot, sum(pow(n_docs, 0.3)) AS ptot FROM c)
      SELECT source, n_docs,
        round(n_docs / tot, 6) AS raw_share,
        round(pow(n_docs, 0.3) / ptot, 6) AS weight,
        round(pow(n_docs, 0.3) / ptot * 1000000 / n_docs, 6) AS epochs
      FROM c, t"""))

  /** Deterministic corpus shuffle as (shard, position): md5-hash sharding
    * + per-shard rank — the reproducible pre-training shuffle with NO
    * global sort (a corpus-wide row_number would serialize into one
    * task; per-shard windows scale with the shard count, and
    * (shard, pos) is a total order). */
  val q95CorpusShuffle = Q(
    "q95_corpus_shuffle",
    (s, d) => graft.operators.Packing.shuffleShard(
        documents(s, d), "doc_id", shards = 16)
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        col("pos").cast("long").as("pos")),
    Some("""WITH h AS (
        SELECT doc_id,
          ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM documents)
      SELECT doc_id, h % 16 AS shard,
        row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) - 1 AS pos
      FROM h"""))

  /** SemDeDup (Abbas et al. 2023): k-means bucketing then within-cluster
    * cosine dedup, keep-lowest-id. The clustering bounds the quadratic —
    * the pairwise compare is an equi-join on cluster id, never a
    * corpus-wide cross product. Oracle replays the identical kmeans
    * recurrence (same CTEs as q93) and the same greedy drop rule. */
  val q96SemDedup = Q(
    "q96_semdedup",
    (s, d) =>
      graft.operators.Clustering.semDeDup(
        embeddings(s, d), "vec_id", "embedding", k = 8, iters = 2,
        threshold = 0.4),
    Some(s"""WITH p AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      k0 AS (SELECT vec_id, v FROM p ORDER BY vec_id LIMIT 8),
      c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
        FROM k0),
      ${kmeansRoundSql("c0", 1)},
      ${kmeansRoundSql("c1", 2)},
      a3 AS (
        SELECT p.vec_id,
          min(struct_pack(d := round(list_aggregate(list_transform(range(1, 65),
              i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i])), 'sum'), 6),
            c := c.cid)) AS best
        FROM p CROSS JOIN c2 c GROUP BY p.vec_id),
      j AS (
        SELECT a.vec_id, CAST(a.best.c AS BIGINT) AS cluster, p.v
        FROM a3 a JOIN p USING (vec_id)),
      drp AS (
        SELECT DISTINCT b.vec_id
        FROM j a JOIN j b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.4)
      SELECT vec_id, cluster,
        vec_id NOT IN (SELECT vec_id FROM drp) AS kept
      FROM j"""))

  /** S4 — Excel-era workbook reader options on the CSV path: an 11-line
    * preamble (skiprows), sheet selection among several per-sheet files,
    * and BART-style ragged-footer BLOCK detection (the footer starts at
    * the first unparseable key row and everything below it is dropped,
    * parseable or not — MultiModalHelper.py:381-387), demonstrated on a
    * CPI-workbook-shaped fixture driven through the reference's
    * getCPIFactors transform (DemandHelper.py:1525-1553: months stacked
    * to rows, CPI_FACTOR = base-year HALF1 / CPI). The workbook content
    * is itself derived from `orders`, so the oracle recomputes the whole
    * round-trip from the base table. */
  val q97WorkbookCpi = Q(
    "q97_workbook_cpi",
    (s, d) => {
      import graft.sources.Workbook
      import s.implicits._
      val tag = d.replaceAll(".*/", "")
      val wbDir = graft.sources.Scratch.dir(s"workbook_$tag")
      def floor4(c: Column) = floor(c * 1e4) / 1e4
      // the monthly "CPI" series: exact-decimal mean of o_totalprice /1000
      val cpiM = orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(floor4(dsum(col("o_totalprice")) / count(lit(1)) / 1000.0).as("cpi"))
      val monNames = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
        "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
      val pivoted = cpiM.groupBy(col("yr")).pivot("mo", 1 to 12).agg(first(col("cpi")))
      val withHalves = pivoted
        .withColumn("HALF1", floor4((col("1") + col("2") + col("3") +
          col("4") + col("5") + col("6")) / 6.0))
        .withColumn("HALF2", floor4((col("7") + col("8") + col("9") +
          col("10") + col("11") + col("12")) / 6.0))
      val fields = (Seq(col("yr")) ++ (1 to 12).map(i => col(s"$i")) ++
        Seq(col("HALF1"), col("HALF2"))).map(c => coalesce(c.cast("string"), lit("")))
      val dataLines = withHalves
        .select((col("yr") + 100).cast("double").as("sortkey"),
          concat_ws(",", fields: _*).as("line"))
      // 11 preamble lines, the header, and a ragged footer: a notes line
      // (unparseable Year = footer start) plus a parseable row BELOW it
      // that must also be dropped (block semantics)
      val fixedLines = (
        (0 until 11).map(i => (i.toDouble, s"BLS synthetic workbook preamble line $i")) ++
        Seq((50.0, ("Year" +: monNames :+ "HALF1" :+ "HALF2").mkString(","))) ++
        Seq((100000.0, "Note: rows below the matrix are footer"),
            (100001.0, ("9999" +: Seq.fill(14)("0.0")).mkString(",")))
      ).toDF("sortkey", "line")
      dataLines.unionByName(fixedLines)
        .repartition(1).sortWithinPartitions("sortkey")
        .select("line")
        .write.mode("overwrite").text(s"$wbDir/BLS Data Series.csv")
      // decoy sheet: sheet selection must pick the right per-sheet file
      Seq("this sheet must not be read").toDF("line")
        .write.mode("overwrite").text(s"$wbDir/Notes.csv")
      val sheet = Workbook.readSheet(s, wbDir, "BLS Data Series",
        skipRows = 11, footerKey = Some("Year"))
      val stacked = sheet.select(
          col("Year").cast("int").as("yr"),
          posexplode(array(monNames.map(col): _*)).as(Seq("mo0", "cpi_s")))
        .withColumn("CPI", col("cpi_s").try_cast("double"))
        .where(col("CPI").isNotNull)
      val baseDf = sheet.where(col("Year").cast("int") === 1995)
        .select(col("HALF1").try_cast("double").as("__base"))
      stacked.crossJoin(broadcast(baseDf))
        .select(
          make_date(col("yr"), col("mo0") + 1, lit(1)).cast("timestamp").as("MONTH"),
          col("CPI"),
          (floor(col("__base") / col("CPI") * 1e6) / 1e6).as("CPI_FACTOR"))
    },
    Some("""WITH m AS (
        SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
          floor(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
            / count(*) / 1000.0 * 1e4) / 1e4 AS cpi
        FROM orders GROUP BY 1, 2),
      p AS (
        SELECT yr,
          max(CASE WHEN mo = 1 THEN cpi END) AS m1,
          max(CASE WHEN mo = 2 THEN cpi END) AS m2,
          max(CASE WHEN mo = 3 THEN cpi END) AS m3,
          max(CASE WHEN mo = 4 THEN cpi END) AS m4,
          max(CASE WHEN mo = 5 THEN cpi END) AS m5,
          max(CASE WHEN mo = 6 THEN cpi END) AS m6
        FROM m GROUP BY yr),
      b AS (
        SELECT floor((m1 + m2 + m3 + m4 + m5 + m6) / 6.0 * 1e4) / 1e4 AS base
        FROM p WHERE yr = 1995)
      SELECT CAST(make_date(yr, mo, 1) AS TIMESTAMP) AS MONTH, cpi AS CPI,
        floor(base / cpi * 1e6) / 1e6 AS CPI_FACTOR
      FROM m, b"""))

  /** Contamination in its 100 TB shuffle shape: the shingle join keyed by
    * the 64-bit md5-derived hash (fixed 8-byte shuffle key instead of
    * ~50-byte raw 8-grams). Same output contract as q88; the oracle
    * replays the identical hash (conv(substr(md5, 1, 15), 16, 10) ==
    * ('0x' || substr(md5, 1, 15))::BIGINT, the q95-proven pattern). */
  val q98ContaminationHashed = Q(
    "q98_contamination_hashed",
    (s, d) =>
      graft.operators.Corpus.contamination(documents(s, d), "doc_id", "text",
        col("doc_id") % 20 === 0, n = 8, hashKey = true),
    Some(s"""WITH t AS ($duckToksSql),
      s0 AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
        FROM t WHERE len(toks) >= 8),
      s AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i : i + 7], ' ') AS shingle
        FROM s0),
      k AS (
        SELECT doc_id,
          ('0x' || substr(md5('0:' || shingle), 1, 15))::BIGINT AS key
        FROM s),
      te AS (SELECT doc_id AS test_id, key FROM k WHERE doc_id % 20 = 0),
      tr AS (SELECT key, doc_id AS train_id FROM k WHERE doc_id % 20 <> 0),
      tot AS (SELECT test_id, count(*) AS total_ngrams FROM te GROUP BY 1),
      h AS (
        SELECT test_id, count(DISTINCT key) AS contaminated_ngrams,
          count(DISTINCT train_id) AS n_contaminating_docs
        FROM te JOIN tr USING (key) GROUP BY 1)
      SELECT t.test_id, t.total_ngrams,
        CAST(COALESCE(h.contaminated_ngrams, 0) AS BIGINT) AS contaminated_ngrams,
        CAST(COALESCE(h.n_contaminating_docs, 0) AS BIGINT) AS n_contaminating_docs,
        round(CAST(COALESCE(h.contaminated_ngrams, 0) AS DOUBLE) / t.total_ngrams, 6)
          AS contamination_ratio
      FROM tot t LEFT JOIN h USING (test_id)"""))

  /** Bucketed co-located join under the oracle: both fact tables written
    * bucketed by the join key (Sinks.writeBucketed — the write-time
    * pre-shuffle), then a merge join that plans with NO shuffle exchange
    * on either side (asserted in ScaleMechanicsSpec; the merge hint keeps
    * the demonstration honest where a local SF would broadcast). The
    * 100 TB fact-to-fact pattern: bucket once, join forever. */
  val q99BucketedJoin = Q(
    "q99_bucketed_join",
    (s, d) => {
      val tag = d.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9]", "_")
      graft.sources.Sinks.writeBucketed(
        lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount"),
        s"li_bkt_$tag", buckets = 16, bucketCol = "l_orderkey")
      graft.sources.Sinks.writeBucketed(
        orders(s, d).select("o_orderkey", "o_orderpriority"),
        s"o_bkt_$tag", buckets = 16, bucketCol = "o_orderkey")
      s.table(s"li_bkt_$tag").hint("merge")
        .join(s.table(s"o_bkt_$tag"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(revDec), 2).cast("double").as("revenue"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1.00 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1"""))

  /** Okapi BM25 keyword-relevance scoring against a fixed topic wordlist —
    * corpus curation's standard ranker. One scan of documents (doc length
    * rides the tf groupBy as a key), broadcast term/global dimensions,
    * per-term contributions rounded then summed exactly as decimal (see
    * Curation.bm25's determinism contract). */
  val q100Bm25 = {
    val terms = Seq("table", "stream", "key", "scan")
    Q(
      "q100_bm25",
      (s, d) =>
        graft.operators.Curation.bm25(documents(s, d), "doc_id", "text",
          terms, k1 = 1.2, b = 0.75),
      Some(s"""WITH t AS ($duckToksSql),
        base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM t),
        totals AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM base),
        tf AS (
          SELECT doc_id, dl, tok, count(*) AS tf
          FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM base)
          WHERE tok IN ('table', 'stream', 'key', 'scan')
          GROUP BY 1, 2, 3),
        dft AS (SELECT tok, count(*) AS df_t FROM tf GROUP BY 1),
        c AS (
          SELECT tf.doc_id,
            CAST(round(
              ln(1.0 + (totals.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
                * (tf.tf * 2.2)
                / (tf.tf + 1.2 * (1.0 - 0.75
                    + 0.75 * tf.dl / (CAST(totals.sum_dl AS DOUBLE) / totals.n_docs))),
              9) AS DECIMAL(28,9)) AS contrib
          FROM tf JOIN dft ON tf.tok = dft.tok CROSS JOIN totals)
        SELECT doc_id, count(*) AS n_terms_matched,
          -- cast the EXACT decimal sum to double BEFORE rounding (mirrors
          -- Spark): rounding the decimal directly can differ at half-way
          -- 6dp boundaries, which a double never lands on exactly
          round(CAST(sum(contrib) AS DOUBLE), 6) AS bm25
        FROM c GROUP BY 1"""))
  }

  /** Incremental dedup of a new batch (doc_id % 10 = 7) against the
    * existing corpus — the daily-crawl pattern: exact fingerprint lookup
    * + SimHash band join, new x corpus only (the corpus is never
    * re-clustered). Radius 6 matches q28's contract: 16-bit/4-chunk
    * banding is pigeonhole-LOSSLESS only to hamming 3; counts at radius
    * 4-6 are band-candidates-only (partial recall by design, identical
    * in the oracle's replay). */
  val q101IncrementalDedup = Q(
    "q101_incremental_dedup",
    (s, d) =>
      Dedup.incrementalNearDup(documents(s, d), "doc_id", "text",
        col("doc_id") % 10 === 7, maxHamming = 6),
    Some {
      val bitSums = (0 until 64).map { b =>
        s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b"
      }.mkString(",\n          ")
      val sigExpr = (0 until 64).map { b =>
        s"CASE WHEN s$b > 0 THEN (1::BIGINT << $b) ELSE 0::BIGINT END"
      }.mkString("\n          + ")
      s"""WITH t AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n
        FROM documents),
      tok AS (
        SELECT doc_id, unnest(string_split(n, ' ')) AS tk
        FROM t WHERE n IS NOT NULL AND len(n) > 0),
      th AS (
        SELECT doc_id, ('0x' || substr(md5('0:' || tk), 1, 15))::BIGINT AS h
        FROM tok),
      bs AS (
        SELECT doc_id,
          $bitSums
        FROM th GROUP BY doc_id),
      sig AS (
        SELECT doc_id,
          $sigExpr AS simhash
        FROM bs),
      alld AS (
        SELECT t.doc_id, md5(t.n) AS fp, s.simhash
        FROM t LEFT JOIN sig s ON t.doc_id = s.doc_id),
      newd AS (SELECT * FROM alld WHERE doc_id % 10 = 7),
      corp AS (SELECT * FROM alld WHERE doc_id % 10 <> 7),
      cfp AS (SELECT DISTINCT fp FROM corp),
      nch AS (
        SELECT doc_id AS nid, simhash AS nh, cs.chunk,
          (simhash >> (cs.chunk * 16)) & 65535 AS key
        FROM newd, (SELECT unnest(range(0, 4)) AS chunk) cs
        WHERE simhash IS NOT NULL),
      cch AS (
        SELECT doc_id AS cid, simhash AS ch, cs.chunk,
          (simhash >> (cs.chunk * 16)) & 65535 AS key
        FROM corp, (SELECT unnest(range(0, 4)) AS chunk) cs
        WHERE simhash IS NOT NULL),
      cand AS (
        SELECT DISTINCT nid, cid, CAST(bit_count(xor(nh, ch)) AS INT) AS hamming
        FROM nch JOIN cch ON nch.chunk = cch.chunk AND nch.key = cch.key),
      near AS (
        SELECT nid, count(*) AS n_near_dups, min(hamming) AS min_hamming
        FROM cand WHERE hamming <= 6 GROUP BY 1)
      SELECT n.doc_id, (cfp.fp IS NOT NULL) AS is_exact_dup,
        COALESCE(near.n_near_dups, 0) AS n_near_dups, near.min_hamming
      FROM newd n
      LEFT JOIN cfp ON n.fp = cfp.fp
      LEFT JOIN near ON n.doc_id = near.nid"""
    })

  /** Power-of-two token-length census with cumulative token share — the
    * context-length / packing planning table. Integral bucketing
    * (length(bin(n)) - 1, no float log), <= 64-row histogram, cumulative
    * pass under the Guards bounded-series contract. */
  val q102LengthHistogram = Q(
    "q102_length_histogram",
    (s, d) =>
      graft.operators.Curation.lengthHistogram(documents(s, d), "text"),
    Some(s"""WITH t AS ($duckToksSql),
      n AS (
        SELECT CAST(len(toks) AS BIGINT) AS n_tokens
        FROM t WHERE len(toks) > 0),
      h AS (
        SELECT CAST(length(bin(n_tokens)) - 1 AS INT) AS bucket,
          count(*) AS n_docs, sum(n_tokens) AS total_tokens
        FROM n GROUP BY 1)
      SELECT bucket, n_docs, CAST(total_tokens AS BIGINT) AS total_tokens,
        round(CAST(total_tokens AS DOUBLE) / CAST(sum(total_tokens) OVER () AS DOUBLE), 6)
          AS token_share,
        round(CAST(sum(total_tokens) OVER (ORDER BY bucket) AS DOUBLE)
          / CAST(sum(total_tokens) OVER () AS DOUBLE), 6) AS cum_token_share
      FROM h"""))

  /** Deterministic content-addressed train/val/test split (md5-bucket mod
    * 100 on the id) — reproducible across runs, orderings, and cluster
    * sizes; map-only at any scale. Summarized per split. */
  val q103HashSplit = Q(
    "q103_hash_split",
    (s, d) =>
      documents(s, d)
        .withColumn("split", graft.operators.Curation.hashSplit(col("doc_id")))
        .withColumn("n_tokens", Text.tokenCount(col("text")).cast("long"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"),
          sum("doc_id").as("id_checksum")),
    Some(s"""WITH t AS ($duckToksSql),
      b AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
        FROM t)
      SELECT CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split,
        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        CAST(sum(doc_id) AS BIGINT) AS id_checksum
      FROM b GROUP BY 1"""))

  /** Per-language top-5 curation cut: language ID (q22's marker cascade)
    * + composite quality (q23's score), then a KEYED window rank — the
    * "keep the N best documents per bucket" selection. The rank order is
    * total (rounded quality desc, doc_id) so Spark and the oracle pick
    * identical rows. */
  val q104TopPerLang = Q(
    "q104_top_per_lang",
    (s, d) => {
      val docs = documents(s, d)
      val counts = Text.tokenSetCounts(docs, "doc_id", "text",
        langMarkers.zipWithIndex.map { case ((_, w), i) => (s"s$i", w) } :+
          ("n_stop", stopwords))
      val scored = counts
        .join(docs.select(col("doc_id").as("id"), col("text")), Seq("id"))
        .withColumn("punct", Text.punctRatio(col("text")))
        .withColumn("stop_r",
          when(col("n_tokens") > 0, col("n_stop").cast("double") / col("n_tokens"))
            .otherwise(0.0))
        .withColumn("lang_pred", langFromScores)
        .withColumn("quality",
          Text.qualityScoreFrom(length(col("text")), col("punct"), col("stop_r")))
        .select(col("id").as("doc_id"), col("lang_pred"), col("quality"))
      graft.operators.Curation.topNPerGroup(scored, Seq("lang_pred"),
          Seq(col("quality").desc, col("doc_id")), n = 5)
        .select(col("lang_pred"), col("rk"), col("doc_id"), col("quality"))
    },
    Some("""WITH t AS (
        SELECT doc_id, text,
          CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
               THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
          END AS toks
        FROM documents),
      m AS (
        SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
          len(list_filter(toks, x -> x IN ('the', 'a'))) AS s0,
          len(list_filter(toks, x -> x IN ('table', 'scan', 'row', 'key'))) AS s1,
          len(list_filter(toks, x -> x IN ('stream', 'batch', 'window'))) AS s2,
          len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'in'))) AS n_stop,
          CASE WHEN length(text) > 0
            THEN CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / length(text)
            ELSE 0.0 END AS punct
        FROM t),
      q AS (
        SELECT doc_id,
          CASE WHEN s0 = 0 AND s1 = 0 AND s2 = 0 THEN 'und'
               WHEN s0 >= s1 AND s0 >= s2 THEN 'art'
               WHEN s1 >= s2 THEN 'db'
               ELSE 'st' END AS lang_pred,
          round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
            * greatest(0.0, 1.0 - punct * 5.0)
            * least(CASE WHEN n_tokens > 0
                         THEN CAST(n_stop AS DOUBLE) / n_tokens
                         ELSE 0.0 END * 5.0, 1.0), 6) AS quality
        FROM m)
      SELECT lang_pred, CAST(rk AS INT) AS rk, doc_id, quality
      FROM (
        SELECT lang_pred, doc_id, quality,
          row_number() OVER (PARTITION BY lang_pred
            ORDER BY quality DESC, doc_id) AS rk
        FROM q)
      WHERE rk <= 5"""))

  /** C4-style cross-document span dedup signal: per doc, the share of its
    * non-overlapping 8-token spans that also occur in another document —
    * the boilerplate/mirror filter. Span keys are 8-byte hashes (the
    * hashed-contamination shuffle-width trade); the planted near-dup
    * documents light up at dup_ratio ~1. */
  val q105SpanDedup = Q(
    "q105_span_dedup",
    (s, d) =>
      graft.operators.Corpus.spanDedup(documents(s, d), "doc_id", "text",
        spanTokens = 8),
    Some(s"""WITH t AS ($duckToksSql),
      c AS (
        SELECT doc_id, toks, unnest(range(0, len(toks), 8)) AS start
        FROM t WHERE len(toks) > 0),
      s AS (
        SELECT doc_id,
          ('0x' || substr(md5('0:' ||
            array_to_string(toks[start + 1 : start + 8], ' ')), 1, 15))::BIGINT AS key
        FROM c),
      sd AS (
        SELECT key, count(DISTINCT doc_id) AS n_docs_with_span
        FROM s GROUP BY 1)
      SELECT s.doc_id, count(*) AS n_spans,
        CAST(count(*) FILTER (WHERE sd.n_docs_with_span >= 2) AS BIGINT) AS dup_spans,
        round(CAST(count(*) FILTER (WHERE sd.n_docs_with_span >= 2) AS DOUBLE)
          / count(*), 6) AS dup_ratio
      FROM s JOIN sd USING (key)
      GROUP BY 1"""))

  /** Trajectory similarity top-k (the REPOSE-class workload): per probe
    * user, the 5 nearest event trajectories by symmetric discrete
    * Hausdorff distance over (minutes-since-start, value) points.
    * Min-value cell blocking with adjacent-cell probing — exact for any
    * pair within the cell width (the directed pass bounds
    * |min_v(A)-min_v(B)| <= H; the mean does NOT satisfy this, see
    * TrajectorySim); fused native Hausdorff kernel (early-break, exact)
    * with nested-HOF fallback. */
  val q106TrajectorySim = Q(
    "q106_trajectory_sim",
    (s, d) =>
      graft.operators.TrajectorySim.hausdorffTopK(events(s, d),
        "user_id", "ts", "event_id", "value", k = 5,
        isProbe = col("id") < 10),
    Some("""WITH e AS (
        SELECT user_id AS id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
          event_id, value AS v
        FROM events),
      t AS (
        SELECT id,
          list(struct_pack(us := us, v := v) ORDER BY us, event_id, v) AS pts,
          min(v) AS min_v
        FROM e GROUP BY 1),
      tr AS (
        SELECT id,
          list_transform(pts,
            p -> struct_pack(t := (p.us - pts[1].us) / 6e7, v := p.v)) AS traj,
          CAST(floor(min_v / 5.0) AS BIGINT) AS cell
        FROM t),
      pr AS (
        SELECT id AS id1, traj AS ta, cell + d.d AS cell
        FROM tr, (SELECT unnest([-1, 0, 1]) AS d) d
        WHERE id < 10),
      sc AS (
        SELECT DISTINCT id1, c.id AS id2,
          greatest(
            list_max(list_transform(pr.ta, p ->
              list_min(list_transform(c.traj, q ->
                sqrt((p.t - q.t) * (p.t - q.t) + (p.v - q.v) * (p.v - q.v)))))),
            list_max(list_transform(c.traj, p ->
              list_min(list_transform(pr.ta, q ->
                sqrt((p.t - q.t) * (p.t - q.t) + (p.v - q.v) * (p.v - q.v))))))
          ) AS h
        FROM pr JOIN tr c ON pr.cell = c.cell AND pr.id1 <> c.id),
      rk AS (
        SELECT id1, id2, h,
          row_number() OVER (PARTITION BY id1 ORDER BY h, id2) AS rk
        FROM sc)
      SELECT id1, CAST(rk AS INT) AS rk, id2, round(h, 6) AS hausdorff
      FROM rk WHERE rk <= 5"""))

  /** Prefix-filtered exact Jaccard similarity join (PPJoin-family):
    * corpus-WIDE exact 5-gram-shingle pairs at threshold 0.5 with no
    * blocking column —
    * rare-first prefixes + length filter generate candidates, lossless
    * for J >= t. The oracle replays the identical pipeline; losslessness
    * itself is proven against brute force in TextDedupSimilaritySpec. */
  val q107PrefixJaccard = Q(
    "q107_prefix_jaccard",
    (s, d) =>
      Dedup.prefixJaccardJoin(documents(s, d), "doc_id", "text",
        n = 5, threshold = 0.5),
    Some(s"""WITH t AS ($duckToksSql),
      s0 AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
        FROM t WHERE len(toks) >= 5),
      dt AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i : i + 4], ' ') AS tok
        FROM s0),
      sets AS (
        SELECT doc_id, list(tok) AS st, count(*) AS sz
        FROM dt GROUP BY 1),
      th AS (
        SELECT doc_id, tok,
          ('0x' || substr(md5('0:' || tok), 1, 15))::BIGINT AS h
        FROM dt),
      dfq AS (SELECT h, count(*) AS c FROM th GROUP BY 1),
      ranked AS (
        SELECT doc_id, h,
          row_number() OVER (PARTITION BY doc_id ORDER BY c, h, tok) AS r,
          count(*) OVER (PARTITION BY doc_id) AS sz
        FROM th JOIN dfq USING (h)),
      pre AS (
        SELECT doc_id, sz, h AS ptok
        FROM ranked WHERE r <= sz - ceil(0.5 * sz) + 1),
      cand AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
          a.sz AS z1, b.sz AS z2
        FROM pre a JOIN pre b ON a.ptok = b.ptok AND a.doc_id < b.doc_id
        WHERE b.sz >= ceil(0.5 * a.sz) AND a.sz >= ceil(0.5 * b.sz)),
      j AS (
        SELECT id1, id2,
          CAST(len(list_intersect(sa.st, sb.st)) AS DOUBLE)
            / (z1 + z2 - len(list_intersect(sa.st, sb.st))) AS jac
        FROM cand
        JOIN sets sa ON cand.id1 = sa.doc_id
        JOIN sets sb ON cand.id2 = sb.doc_id)
      SELECT id1, id2, round(jac, 6) AS jaccard
      FROM j WHERE jac >= 0.5"""))

  /** Multimodal resize: nearest-neighbor resample of each blob's byte
    * grid to 8x8 (real integer resample math over the stubbed
    * bytes-as-pixels view; same mapPartitions batch shape as the other
    * decode ops). The oracle replays the exact index arithmetic —
    * sx = x*side/8, sy = y*side/8 over side = floor(sqrt(n_bytes)) —
    * character-indexed, which equals byte-indexed on this ASCII corpus. */
  val q108Resize = Q(
    "q108_resize",
    (s, d) =>
      graft.multimodal.Binary.resize(
          graft.multimodal.Binary.documentBlobs(documents(s, d), "doc_id", "text"),
          w = 8, h = 8)
        .toDF()
        .select(col("id").as("doc_id"), col("src_side"), col("out_w"),
          col("out_h"), col("checksum")),
    Some("""WITH b AS (
        SELECT doc_id, hx,
          CAST(floor(sqrt(strlen(hx) // 2)) AS INT) AS side
        FROM (SELECT doc_id, hex(encode(text)) AS hx FROM documents)
        WHERE floor(sqrt(strlen(hx) // 2)) >= 1)
      SELECT doc_id, side AS src_side, 8 AS out_w, 8 AS out_h,
        CAST(list_sum(list_transform(range(0, 64), i ->
          ('0x' || substr(hx,
            2 * (((i // 8) * side // 8) * side + ((i % 8) * side // 8)) + 1,
            2))::INT)) % 997 AS BIGINT) AS checksum
      FROM b"""))

  /** Multi-probe LSH ANN: each probe also searches the `planes` buckets
    * one hyperplane-sign flip away — the classic recall knob at
    * (planes+1)x probe fan-out with ZERO extra corpus-side work (corpus
    * vectors index once; only the broadcast probe table widens).
    * Recall >= single-probe q29 by construction (superset of buckets);
    * the recall spec quantifies the gain vs brute force. */
  val q109AnnMultiprobe = Q(
    "q109_ann_multiprobe",
    (s, d) => {
      val emb = embeddings(s, d)
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", "vec_id", k = 5, planes = 4, dims = 64,
        multiProbe = true)
    },
    Some {
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      b AS (
        SELECT vec_id, e,
          ${duckBucketExpr(4, 64, "e")} AS bucket
        FROM v),
      pr0 AS (SELECT vec_id AS probe_id, e AS pe, bucket FROM b WHERE vec_id < 10),
      pr AS (
        SELECT probe_id, pe,
          unnest(list_prepend(bucket,
            list_transform(range(0, 4), bb -> xor(bucket, 1 << bb)))) AS bucket
        FROM pr0),
      sc AS (
        SELECT DISTINCT pr.probe_id, c.vec_id AS neighbor_id,
          list_cosine_similarity(c.e, pr.pe) AS cosf
        FROM b c JOIN pr ON c.bucket = pr.bucket AND c.vec_id <> pr.probe_id),
      rk AS (
        SELECT probe_id, neighbor_id, cosf,
          row_number() OVER (PARTITION BY probe_id ORDER BY cosf DESC, neighbor_id) AS rank
        FROM sc)
      SELECT probe_id, rank, neighbor_id, round(cosf, 6) AS cos
      FROM rk WHERE rank <= 5"""
    })

  /** S7+G2 — movement-table skim from a sectioned network file: the
    * MOVEMENTS section (node triples at/start/end) becomes the edge set
    * of the link graph — an absent movement is a turn RESTRICTION — and
    * each movement pays its 30/10/60 s left/right/U penalty
    * (HwyNetwork.py:129-141,227-294). The fixture plants both effects:
    * 21→26 flips from the sharp 45° bulge (free-flow 140 s) to the
    * through-graded shallow bulge (204 s penalized vs 210), and 21→27
    * must detour because the file omits the 23→27 movement. Free-flow
    * columns use the all-turns-allowed geometric skim as the contrast.
    * Oracle = hand-derived VALUES. */
  val q110MovementSkim = Q(
    "q110_movement_skim",
    (s, d) => {
      import graft.pipelines.MapMatch
      import graft.sources.NetworkFile
      val path = graft.sources.Scratch.dir("net110") + "/network_mv.dqt"
      new java.io.File(path).getParentFile.mkdirs()
      val text =
        """<DYNAMEQ>
          |<VERSION_1.8>
          |<BASE_NETWORK_FILE>
          |NODES
          |* id x y
          |1 10000 0
          |2 11000 0
          |3 11500 500
          |4 11500 125
          |5 12000 0
          |6 13000 0
          |7 12000 -1000
          |LINKS
          |* id start end length fspeed
          |21 1 2 0.5 36
          |22 2 3 0.2 36
          |23 3 5 0.2 36
          |24 2 4 0.52 36
          |25 4 5 0.52 36
          |26 5 6 0.5 36
          |27 5 7 0.5 36
          |MOVEMENTS
          |* at start end
          |2 1 3
          |2 1 4
          |3 2 5
          |4 2 5
          |5 3 6
          |5 4 6
          |5 4 7
          |""".stripMargin
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), text)
      val sections = NetworkFile.readSections(s, path)
      val links = NetworkFile.roadLinks(sections)
        .select("link_id", "ax", "ay", "bx", "by", "ff_sec")
        .collect().map(r => MapMatch.Link(r.getLong(0), r.getDouble(1),
          r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toSeq
      val moves = NetworkFile.movementLinkPairs(sections)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val ff = MapMatch.linkSkim(links)
      val pen = MapMatch.linkSkimPenalized(links, moves)
      import s.implicits._
      Seq((21L, 23L), (21L, 26L), (21L, 27L), (24L, 26L)).map { od =>
        def fmt(e: (Double, Vector[Long])) =
          (math.rint(e._1 * 1e4) / 1e4, e._2.mkString("-"))
        val (fc, fp) = fmt(ff(od)); val (pc, pp) = fmt(pen(od))
        (od._1, od._2, fc, fp, pc, pp)
      }.toDF("src", "dst", "ff_cost", "ff_path", "turn_cost", "turn_path")
    },
    Some("""SELECT * FROM (VALUES
        (21, 23, 90.0,  '21-22-23',    130.0, '21-22-23'),
        (21, 26, 140.0, '21-22-23-26', 204.0, '21-24-25-26'),
        (21, 27, 140.0, '21-22-23-27', 214.0, '21-24-25-27'),
        (24, 26, 154.0, '24-25-26',    154.0, '24-25-26'))
      t(src, dst, ff_cost, ff_path, turn_cost, turn_path)"""))

  /** J7 — LODES-style double-crosswalk OD rollup: the SAME crosswalk
    * joined twice, once per geocode, with _h/_w aliases
    * (DemandHelper.py:1201,1223-1224 merges xwalk on hgeoCol then wgeoCol
    * with suffixes ('_h','_w')), then county-pair totals and the
    * INTRA/IN/OUT flow classification relative to a focal county
    * (DemandHelper.py:1228-1240). Here the OD fact is customer-nation ->
    * supplier-nation worker flows off lineitem, the crosswalk is nation
    * (geocode -> region 'county'), and the focal county is region 1.
    * Scale shape: the crosswalk is broadcast on BOTH aliases; the fact
    * side stays distributed throughout. */
  val q111OdCrosswalk = Q(
    "q111_od_crosswalk",
    (s, d) => {
      val xwalk = nation(s, d)
        .select(col("n_nationkey").as("geo"), col("n_regionkey").as("cty"))
      val od = lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_quantity")
        .join(orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select(col("c_custkey"),
          col("c_nationkey").as("h_geo")), col("o_custkey") === col("c_custkey"))
        .join(supplier(s, d).select(col("s_suppkey"),
          col("s_nationkey").as("w_geo")), col("l_suppkey") === col("s_suppkey"))
      val focal = lit(1L)
      od
        .join(broadcast(xwalk.select(col("geo").as("h_geo"),
          col("cty").as("cty_h"))), Seq("h_geo"), "left")
        .join(broadcast(xwalk.select(col("geo").as("w_geo"),
          col("cty").as("cty_w"))), Seq("w_geo"), "left")
        .groupBy(col("cty_h"), col("cty_w"))
        .agg(count(lit(1)).as("n_flows"),
          round(sum("l_quantity"), 2).as("workers"))
        .withColumn("flow",
          when(col("cty_h") === focal && col("cty_w") === focal, "INTRA")
            .when(col("cty_w") === focal, "IN")
            .when(col("cty_h") === focal, "OUT")
            .otherwise("THRU"))
        .select("cty_h", "cty_w", "flow", "n_flows", "workers")
    },
    Some("""WITH od AS (
        SELECT nh.n_regionkey AS cty_h, nw.n_regionkey AS cty_w, l_quantity
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        LEFT JOIN nation nh ON c_nationkey = nh.n_nationkey
        LEFT JOIN nation nw ON s_nationkey = nw.n_nationkey)
      SELECT cty_h, cty_w,
        CASE WHEN cty_h = 1 AND cty_w = 1 THEN 'INTRA'
             WHEN cty_w = 1 THEN 'IN'
             WHEN cty_h = 1 THEN 'OUT'
             ELSE 'THRU' END AS flow,
        count(*) AS n_flows, round(sum(l_quantity), 2) AS workers
      FROM od GROUP BY 1, 2"""))

  /** S1 on the REAL colspec registry: lineitem mapped onto the reference's
    * transcribed 98-column STP table (SFMuniDataHelper.py:71-170), the
    * default 62-column read set formatted to fixed-width text at the
    * registry's absolute byte positions (1-byte separator gaps and the
    * zero-width LOADCODE window included), read back through
    * StpRegistry.read (na-values, int64-via-float64 forcing, SEQ dropna),
    * revenue-service filtered (DIR < 2, QC201 <= 20, ROUTE_AVL > 0,
    * :488-496), and aggregated. The oracle recomputes the same derivations
    * straight from the parquet — equality proves the full-registry
    * round-trip and the filter semantics. Decimal sums: fixed-point
    * measures ride decimals so sum order can't wobble the hash. */
  /** q112's 600k-row fixed-width fixture, staged ONCE per (process,
    * sfDir): the fixture write is setup, not the registry scan under
    * test, and re-writing it on every bench iteration made q112's
    * single-shot read as 50 s of I/O against a 4-9 s steady state
    * (VERDICT r06). computeIfAbsent serializes concurrent writers per
    * key; Scratch keeps the path process-unique. */
  private val stpFixtureByDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val q112StpRegistry = Q(
    "q112_stp_registry",
    (s, d) => {
      import graft.sources.StpRegistry
      val tag = d.replaceAll(".*/", "")
      val overrides: Map[String, Column] = Map(
        "SEQ" -> col("l_linenumber").cast("long"),
        "STOP_AVL" -> pmod(col("l_partkey"), lit(9000)),
        "STOPNAME_AVL" -> concat(lit("S"), pmod(col("l_partkey"), lit(9000))),
        "ARRIVAL_TIME_INT" -> pmod(col("l_orderkey"), lit(86400)),
        "ON" -> col("l_quantity").cast("long"),
        "OFF" -> floor(col("l_quantity") / 2).cast("long"),
        "DATE_INT" -> date_format(col("l_shipdate"), "yyMMdd").cast("long"),
        "ROUTE_AVL" -> pmod(col("l_suppkey"), lit(100)),
        "PATTERN" -> concat(lit("P"), pmod(col("l_suppkey"), lit(10))),
        "LAT" -> round(lit(37.0) + pmod(col("l_partkey"), lit(100)) / 1000.0, 3),
        "LON" -> round(lit(-122.0) - pmod(col("l_suppkey"), lit(100)) / 1000.0, 3),
        "MILES" -> round(col("l_quantity") / 10.0, 1),
        "TRIP" -> pmod(col("l_orderkey"), lit(10000)),
        "DOW" -> (pmod(col("l_orderkey"), lit(3)) + 1),
        "DIR" -> pmod(col("l_orderkey"), lit(4)),
        "QC201" -> pmod(col("l_partkey"), lit(25)),
        "UON" -> col("l_quantity").cast("long"),
        "RECORD" -> lit("R"), "NS" -> lit("N"), "EW" -> lit("E"),
        "MSFILE" -> lit("1401"), "CAPACITY" -> lit(60L))
      val cols62 = StpRegistry.defaultColumns.map { e =>
        overrides.getOrElse(e.name, e.kind match {
          case 'I' => lit(0L); case 'F' => lit(0.0); case _ => lit("")
        }).as(e.name)
      }
      val path = stpFixtureByDir.computeIfAbsent(d, _ => {
        val p = graft.sources.Scratch.dir(s"stp_$tag")
        lineitem(s, d).select(cols62: _*)
          .select(graft.sources.FixedWidth.formatLine(
            StpRegistry.writerSpecs(StpRegistry.defaultColumns)).as("value"))
          .write.mode("overwrite").text(p)
        p
      })
      StpRegistry.revenueService(StpRegistry.read(s, path))
        .groupBy(col("DOW"), col("DIR"))
        .agg(count(lit(1)).as("n"),
          sum(col("ON")).as("on_sum"),
          sum(col("OFF")).as("off_sum"),
          sum(col("MILES").cast("decimal(14,1)")).cast("double").as("miles_sum"),
          sum(col("LAT").cast("decimal(14,3)")).cast("double").as("lat_sum"))
    },
    Some("""WITH stp AS (
        SELECT 1 + l_orderkey % 3 AS DOW, l_orderkey % 4 AS DIR,
          l_partkey % 25 AS qc201, l_suppkey % 100 AS route,
          CAST(l_quantity AS BIGINT) AS on_cnt,
          CAST(floor(l_quantity / 2) AS BIGINT) AS off_cnt,
          CAST(round(l_quantity / 10, 1) AS DECIMAL(14,1)) AS miles,
          CAST(round(37 + (l_partkey % 100) / 1000.0, 3) AS DECIMAL(14,3)) AS lat
        FROM lineitem)
      SELECT DOW, DIR, count(*) AS n,
        CAST(sum(on_cnt) AS BIGINT) AS on_sum,
        CAST(sum(off_cnt) AS BIGINT) AS off_sum,
        CAST(sum(miles) AS DOUBLE) AS miles_sum,
        CAST(sum(lat) AS DOUBLE) AS lat_sum
      FROM stp WHERE DIR < 2 AND qc201 <= 20 AND route > 0
      GROUP BY 1, 2"""))

  /** meanTimes rule method (SFMuniDataAggregator.py:1218-1254): datetime
    * mean = integer mean of whole epoch seconds (the reference's
    * Python-2 integer arithmetic end-to-end, sub-second truncation, null
    * for an all-null group), alongside ordinary rules in the same
    * engine pass. */
  val q113RuleaggMeantime = Q(
    "q113_ruleagg_meantime",
    (s, d) => {
      val rules = Seq(
        AggRule("mean_ts", "ts", AggMethod.MeanTime),
        AggRule("n", "event_id", AggMethod.Count),
        AggRule("sum_value", "value", AggMethod.Sum))
      RuleAgg.aggregate(events(s, d), Seq("event_type"), rules)
        .select(col("event_type"), col("mean_ts"), col("n"),
          round(col("sum_value"), 4).as("sum_value"))
    },
    Some("""SELECT event_type,
        make_timestamp(((sum(epoch_us(ts) // 1000000) // count(ts))
          * 1000000)::BIGINT) AS mean_ts,
        count(*) AS n, round(sum(value), 4) AS sum_value
      FROM events GROUP BY 1"""))

  /** G4+ — smoother posteriors under the driver gate
    * (Trajectory.py:220-235): two identical parallel links equidistant
    * from a centerline trip make every path-cost term symmetric, so the
    * forward-backward posterior is EXACTLY 1/2 per candidate (and 1.0
    * for an offset trip that sees a single candidate) — transcendental
    * exp() never reaches the output, so the values hash against a
    * VALUES oracle. */
  val q114ViterbiPosteriors = Q(
    "q114_viterbi_posteriors",
    (s, d) => {
      import graft.pipelines.MapMatch
      import s.implicits._
      val links = Seq(
        MapMatch.Link(31L, 20000, 100, 21000, 100, 50),
        MapMatch.Link(32L, 20000, -100, 21000, -100, 50))
      val skim = MapMatch.linkSkimPenalized(
        links, MapMatch.geometricMovements(links))
      val byId = links.map(l => l.linkId -> l).toMap
      val pts = Seq(
        // trip A rides the centerline: both links at distance 100
        ("A", 0L, 0.0, 20600.0, 0.0), ("A", 1L, 60.0, 20900.0, 0.0),
        // trip B rides offset +80: link 31 at 20, link 32 at 180 (> 150)
        ("B", 0L, 0.0, 20600.0, 80.0), ("B", 1L, 60.0, 20900.0, 80.0)
      ).toDF("trip", "pt", "ts", "x", "y")
      val cands = MapMatch.candidateStates(pts, links, "trip", "pt", "x", "y")
      MapMatch.viterbiPosteriors(cands, "trip", "pt", "ts", skim, byId)
        .select(col("trip"), col("pt"), col("link_id"),
          round(col("prob"), 6).as("prob"))
    },
    Some("""SELECT * FROM (VALUES
        ('A', 0, 31, 0.5), ('A', 0, 32, 0.5),
        ('A', 1, 31, 0.5), ('A', 1, 32, 0.5),
        ('B', 0, 31, 1.0), ('B', 1, 31, 1.0))
      t(trip, pt, link_id, prob)"""))

  /** CCNet-style LM quality scoring (Wenzek et al., LREC 2020): an
    * add-one bigram model trained on the deterministic hash-split
    * "train" slice scores every document's mean bigram NLL — the
    * "perplexity against a reference model" curation signal. The bigram
    * count table joins by shuffle (it scales with corpus, not vocab);
    * unigrams + vocab size broadcast. */
  val q115LmPerplexity = Q(
    "q115_lm_perplexity",
    (s, d) =>
      graft.operators.LangModel.bigramNll(
        documents(s, d), "doc_id", "text",
        Curation.hashSplit(col("doc_id")) === "train"),
    Some(s"""WITH t AS ($duckToksSql),
      ref AS (
        SELECT doc_id, toks FROM t
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 80),
      uni AS (
        SELECT w, count(*) AS c1
        FROM (SELECT unnest(toks) AS w FROM ref) GROUP BY 1),
      v AS (SELECT count(*) AS v FROM uni),
      bi AS (
        SELECT bg, count(*) AS c12 FROM (
          SELECT toks[i] || ' ' || toks[i + 1] AS bg
          FROM (SELECT toks, unnest(range(1, len(toks))) AS i
                FROM ref WHERE len(toks) >= 2))
        GROUP BY 1),
      db AS (
        SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS bg
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
              FROM t WHERE len(toks) >= 2)),
      sc AS (
        SELECT db.doc_id,
          CAST(round(-ln((coalesce(bi.c12, 0) + 1.0) /
                         (coalesce(uni.c1, 0) + v.v)), 9) AS DECIMAL(28,9)) AS nll
        FROM db LEFT JOIN bi USING (bg)
                LEFT JOIN uni ON db.w1 = uni.w
                CROSS JOIN v)
      SELECT doc_id, count(*) AS n_bigrams,
        round(CAST(sum(nll) AS DOUBLE) / count(*), 6) AS avg_nll
      FROM sc GROUP BY 1"""))

  /** DSIR hashed importance weights (Xie et al., NeurIPS 2023): rank the
    * corpus by target-likeness of its hashed unigram distribution —
    * target = three sources, raw = everything. One explode pass, a
    * 256-row broadcast log-ratio dimension, decimal-exact weight sums. */
  val q116DsirWeights = Q(
    "q116_dsir_weights",
    (s, d) =>
      Curation.dsirWeights(documents(s, d), "doc_id", "text",
        col("source").isin("src0", "src1", "src2")),
    Some("""WITH d AS (
        SELECT doc_id, source IN ('src0', 'src1', 'src2') AS t,
          CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
          END AS toks
        FROM documents),
      bc AS (
        SELECT doc_id, t,
          ('0x' || substr(md5('7:' || tok), 1, 15))::BIGINT % 256 AS bucket,
          count(*) AS n
        FROM (SELECT doc_id, t, unnest(toks) AS tok FROM d)
        GROUP BY 1, 2, 3),
      pb AS (
        SELECT bucket, sum(CASE WHEN t THEN n ELSE 0 END) AS ct, sum(n) AS cr
        FROM bc GROUP BY 1),
      tt AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM pb),
      dim AS (
        SELECT bucket,
          round(ln((ct + 1.0) / (tt + 256.0)) - ln((cr + 1.0) / (tr + 256.0)), 9) AS lr
        FROM pb CROSS JOIN tt),
      sc AS (
        SELECT bc.doc_id, bc.n,
          CAST(round(bc.n * dim.lr, 9) AS DECIMAL(28,9)) AS c
        FROM bc JOIN dim USING (bucket))
      SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
        round(CAST(sum(c) AS DOUBLE), 6) AS dsir_weight
      FROM sc GROUP BY 1"""))

  /** The Gopher quality-rule battery (Rae et al. 2021, Appendix A1.1)
    * rolled up per language: how many documents pass each published rule
    * and all of them together. Map-only per-row flags + one tiny groupBy
    * — filtering 100 TB at this step never shuffles the corpus. */
  val q117GopherRules = Q(
    "q117_gopher_rules",
    (s, d) =>
      Curation.gopherFlags(documents(s, d), "text")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("r_words")).as("n_words_ok"),
          count_if(col("r_meanlen")).as("n_meanlen_ok"),
          count_if(col("r_symbol")).as("n_symbol_ok"),
          count_if(col("r_bullet")).as("n_bullet_ok"),
          count_if(col("r_ellipsis")).as("n_ellipsis_ok"),
          count_if(col("r_alpha")).as("n_alpha_ok"),
          count_if(col("r_stop")).as("n_stop_ok"),
          count_if(col("pass_all")).as("n_pass")),
    Some("""WITH f AS (
        SELECT lang,
          len(toks) AS n_words,
          CASE WHEN len(toks) BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r_words,
          CASE WHEN len(toks) > 0 AND
                 (length(norm) - (len(toks) - 1)) / len(toks) BETWEEN 3.0 AND 10.0
               THEN 1 ELSE 0 END AS r_meanlen,
          CASE WHEN len(toks) > 0 AND
                 len(regexp_extract_all(text, '#')) / len(toks) <= 0.1 AND
                 len(regexp_extract_all(text, '\.\.\.')) / len(toks) <= 0.1
               THEN 1 ELSE 0 END AS r_symbol,
          CASE WHEN len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))
                 / len(lines) <= 0.9 THEN 1 ELSE 0 END AS r_bullet,
          CASE WHEN len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                 / len(lines) <= 0.3 THEN 1 ELSE 0 END AS r_ellipsis,
          CASE WHEN len(toks) > 0 AND
                 len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
                 / len(toks) >= 0.8 THEN 1 ELSE 0 END AS r_alpha,
          CASE WHEN len(list_distinct(list_intersect(toks,
                 ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))) >= 2
               THEN 1 ELSE 0 END AS r_stop
        FROM (
          SELECT lang, text,
            trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
            CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = '' THEN CAST([] AS VARCHAR[])
                 ELSE string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
            END AS toks,
            string_split(text, chr(10)) AS lines
          FROM documents))
      SELECT lang, count(*) AS n_docs,
        CAST(sum(r_words) AS BIGINT) AS n_words_ok,
        CAST(sum(r_meanlen) AS BIGINT) AS n_meanlen_ok,
        CAST(sum(r_symbol) AS BIGINT) AS n_symbol_ok,
        CAST(sum(r_bullet) AS BIGINT) AS n_bullet_ok,
        CAST(sum(r_ellipsis) AS BIGINT) AS n_ellipsis_ok,
        CAST(sum(r_alpha) AS BIGINT) AS n_alpha_ok,
        CAST(sum(r_words * r_meanlen * r_symbol * r_bullet * r_ellipsis * r_alpha * r_stop) AS BIGINT) AS n_pass,
        CAST(sum(r_stop) AS BIGINT) AS n_stop_ok
      FROM f GROUP BY 1"""))

  /** Length-aware zipper pair packing vs adjacent baseline: pairing
    * longest-with-shortest inside each hash shard concentrates pair
    * lengths around the mean, cutting fixed-capacity padding waste — the
    * sorted-batching heuristic, shard-keyed so no global sort exists at
    * any scale. Two window passes over the same shard partitioning, one
    * summary row per strategy. */
  val q118ZipperPack = Q(
    "q118_zipper_pack",
    (s, d) => {
      val docs = documents(s, d)
        .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      def roll(df: DataFrame, tag: String) =
        df.groupBy().agg(count(lit(1)).as("n_pairs"),
            sum("padding").as("total_padding"),
            sum("overflow").as("total_overflow"),
            sum("pair_tokens").as("total_tokens"))
          .withColumn("strategy", lit(tag))
      roll(Packing.zipperPack(docs, "doc_id", "n_tokens", 8, 128, zipper = true),
          "zipper")
        .unionByName(
          roll(Packing.zipperPack(docs, "doc_id", "n_tokens", 8, 128, zipper = false),
            "adjacent"))
    },
    Some(s"""WITH t AS ($duckToksSql),
      d AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
          ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard
        FROM t),
      rz AS (
        SELECT shard, n_tokens,
          row_number() OVER (PARTITION BY shard ORDER BY n_tokens DESC, doc_id) AS rk,
          count(*) OVER (PARTITION BY shard) AS n
        FROM d),
      pz AS (
        SELECT shard, least(rk, n + 1 - rk) AS pair, sum(n_tokens) AS pt
        FROM rz GROUP BY 1, 2),
      ra AS (
        SELECT shard, n_tokens,
          row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rk
        FROM d),
      pa AS (
        SELECT shard, (rk + 1) // 2 AS pair, sum(n_tokens) AS pt
        FROM ra GROUP BY 1, 2),
      u AS (
        SELECT 'zipper' AS strategy, pt FROM pz
        UNION ALL
        SELECT 'adjacent' AS strategy, pt FROM pa)
      SELECT count(*) AS n_pairs,
        CAST(sum(greatest(0, 128 - pt)) AS BIGINT) AS total_padding,
        CAST(sum(greatest(0, pt - 128)) AS BIGINT) AS total_overflow,
        CAST(sum(pt) AS BIGINT) AS total_tokens,
        strategy
      FROM u GROUP BY strategy"""))

  /** Product quantization + ADC top-k (Jégou et al., TPAMI 2011): M=8
    * subspaces x K=16 codewords over the 64-dim embeddings; every vector
    * encoded map-side against the literal codebook, the query's ADC
    * table precomputed on the driver, approximate distance = 8 table
    * lookups summed as exact decimal. Exact squared-L2 reported beside
    * it as the recall yardstick. No join, no shuffle — encode + score is
    * one projection pass, then TakeOrdered. */
  val q119PqAdc = Q(
    "q119_pq_adc",
    (s, d) => {
      import graft.operators.Quantization
      val e = embeddings(s, d)
      // TRAINED codebook: 2 per-subspace Lloyd rounds from the
      // deterministic init (r05 verdict item 3 — init-only PQ loses
      // recall it doesn't have to; QuantizationSpec pins the recall win)
      val cb = Quantization.trainCodebook(e, "vec_id", "embedding",
        k = 16, m = 8, dims = 64, iters = 2)
      val query = cb(5)
      val table = Quantization.adcTable(query, cb, 8)
      e.withColumn("codes", Quantization.pqCodes(col("embedding"), cb, 8, 64))
        .withColumn("approx_d", Quantization.adcScore(col("codes"), table))
        .withColumn("exact_d",
          round(Quantization.exactDist(col("embedding"), query), 6))
        .orderBy(col("approx_d"), col("vec_id")).limit(20)
        .select(col("vec_id"), col("approx_d"), col("exact_d"))
    },
    Some(s"""WITH p AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ms AS (SELECT unnest(range(0, 8)) AS m),
      cb0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v AS cv
        FROM (SELECT vec_id, v FROM p ORDER BY vec_id LIMIT 16)),
      ${pqTrainRoundSql("cb0", 1)},
      ${pqTrainRoundSql("cb1", 2)},
      cb AS (SELECT k, cv FROM cb2),
      q AS (SELECT cv AS qv FROM cb WHERE k = 5),
      dd AS (
        SELECT p.vec_id, ms.m, cb.k,
          round(list_aggregate(list_transform(range(1, 9),
            i -> (p.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]) *
                 (p.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])), 'sum'), 6) AS dpart
        FROM p CROSS JOIN ms CROSS JOIN cb),
      code AS (
        SELECT vec_id, m, min(struct_pack(d := dpart, c := k)) AS best
        FROM dd GROUP BY 1, 2),
      qt AS (
        SELECT ms.m, cb.k,
          round(list_aggregate(list_transform(range(1, 9),
            i -> (q.qv[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]) *
                 (q.qv[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])), 'sum'), 6) AS t
        FROM q CROSS JOIN ms CROSS JOIN cb),
      approx AS (
        SELECT code.vec_id,
          CAST(sum(CAST(qt.t AS DECIMAL(18,6))) AS DOUBLE) AS approx_d
        FROM code JOIN qt ON code.m = qt.m AND code.best.c = qt.k
        GROUP BY 1),
      ex AS (
        SELECT p.vec_id,
          round(list_aggregate(list_transform(range(1, 65),
            i -> (p.v[i] - q.qv[i]) * (p.v[i] - q.qv[i])), 'sum'), 6) AS exact_d
        FROM p CROSS JOIN q)
      SELECT vec_id, approx_d, exact_d
      FROM approx JOIN ex USING (vec_id)
      ORDER BY approx_d, vec_id LIMIT 20"""))

  /** IVF-PQ composition — the production ANN index shape (FAISS's
    * IVFPQ): coarse cells prune the corpus to nprobe=2 probed cells,
    * then PQ codes + the ADC table re-rank ONLY the surviving
    * candidates. The coarse centroids (decimal-exact label means) are
    * collected once — |cells| x dims doubles, config-scale — so the
    * coarse assignment is a LITERAL argmin projection (pqCodes with
    * m=1), the probe cells are picked on the driver, and the whole
    * corpus-side plan is scan -> filter -> project -> TakeOrdered: one
    * pass, no join, no shuffle at any scale. */
  val q120IvfPq = Q(
    "q120_ivf_pq",
    (s, d) => {
      import graft.operators.Quantization
      val e = embeddings(s, d)
      val centRows = Clustering.labelCentroids(e, "label", "embedding")
        .orderBy(col("cell")).collect()
      val cellIds = centRows.map(_.getInt(0)).toIndexedSeq
      val cents = centRows
        .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
      val cb = Quantization.trainCodebook(e, "vec_id", "embedding",
        k = 16, m = 8, dims = 64, iters = 2)
      val qv = cb(5)
      val table = Quantization.adcTable(qv, cb, 8)
      // probe cells: 2 nearest centroids to the query, computed on the
      // driver with the same rounded ascending-dim fold the oracle uses
      val qd = Quantization.adcTable(qv, cents, 1)(0)
      val probeCells = cellIds.zip(qd).sortBy { case (c, dd) => (dd, c) }
        .take(2).map(_._1)
      // coarse assignment = PQ argmin with one subspace spanning all dims
      val cellIdx = element_at(
        Quantization.pqCodes(col("embedding"), cents, 1, 64), 1)
      val cellOf = element_at(array(cellIds.map(lit): _*), cellIdx + 1)
      e.withColumn("cell", cellOf)
        .where(col("cell").isin(probeCells: _*))
        .withColumn("codes", Quantization.pqCodes(col("embedding"), cb, 8, 64))
        .withColumn("approx_d", Quantization.adcScore(col("codes"), table))
        .withColumn("exact_d",
          round(Quantization.exactDist(col("embedding"), qv), 6))
        .orderBy(col("approx_d"), col("vec_id")).limit(10)
        .select(col("vec_id"), col("cell"), col("approx_d"), col("exact_d"))
    },
    Some(s"""WITH idx AS (
        SELECT label AS cell, embedding::DOUBLE[] AS ev,
          unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings),
      dims AS (
        SELECT cell, pos,
          round(CAST(sum(CAST(ev[CAST(pos AS INT)] AS DECIMAL(28,12))) AS DOUBLE)
            / count(*), 6) AS cv
        FROM idx GROUP BY 1, 2),
      cent AS (
        SELECT cell, list(cv ORDER BY pos) AS centroid FROM dims GROUP BY 1),
      v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      ca AS (
        SELECT v.vec_id,
          min(struct_pack(d := round(list_sum(list_transform(range(1, 65),
              i -> (e[i] - centroid[i]) * (e[i] - centroid[i]))), 6),
            c := cell)) AS best
        FROM v CROSS JOIN cent GROUP BY v.vec_id),
      cells AS (
        SELECT ca.vec_id, v.e, ca.best.c AS cell
        FROM ca JOIN v USING (vec_id)),
      p AS (SELECT vec_id, e AS v FROM v),
      ms AS (SELECT unnest(range(0, 8)) AS m),
      cb0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v AS cv
        FROM (SELECT vec_id, v FROM p ORDER BY vec_id LIMIT 16)),
      ${pqTrainRoundSql("cb0", 1)},
      ${pqTrainRoundSql("cb1", 2)},
      cb AS (SELECT k, cv FROM cb2),
      q AS (SELECT cv AS qv FROM cb WHERE k = 5),
      probe AS (
        SELECT cell FROM cent CROSS JOIN q
        ORDER BY round(list_sum(list_transform(range(1, 65),
          i -> (centroid[i] - qv[i]) * (centroid[i] - qv[i]))), 6), cell
        LIMIT 2),
      cand AS (
        SELECT cells.vec_id, cells.e, cells.cell
        FROM cells JOIN probe USING (cell)),
      dd AS (
        SELECT cand.vec_id, ms.m, cb.k,
          round(list_aggregate(list_transform(range(1, 9),
            i -> (cand.e[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]) *
                 (cand.e[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])), 'sum'), 6) AS dpart
        FROM cand CROSS JOIN ms CROSS JOIN cb),
      code AS (
        SELECT vec_id, m, min(struct_pack(d := dpart, c := k)) AS best
        FROM dd GROUP BY 1, 2),
      qt AS (
        SELECT ms.m, cb.k,
          round(list_aggregate(list_transform(range(1, 9),
            i -> (q.qv[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]) *
                 (q.qv[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])), 'sum'), 6) AS t
        FROM q CROSS JOIN ms CROSS JOIN cb),
      approx AS (
        SELECT code.vec_id,
          CAST(sum(CAST(qt.t AS DECIMAL(18,6))) AS DOUBLE) AS approx_d
        FROM code JOIN qt ON code.m = qt.m AND code.best.c = qt.k
        GROUP BY 1),
      ex AS (
        SELECT cand.vec_id, cand.cell,
          round(list_aggregate(list_transform(range(1, 65),
            i -> (cand.e[i] - q.qv[i]) * (cand.e[i] - q.qv[i])), 'sum'), 6) AS exact_d
        FROM cand CROSS JOIN q)
      SELECT vec_id, cell, approx_d, exact_d
      FROM approx JOIN ex USING (vec_id)
      ORDER BY approx_d, vec_id LIMIT 10"""))

  /** Deterministic per-source cap (the RefinedWeb/Gopher "limit documents
    * per domain" rule, doubling as an exact-N stratified sample): rank
    * every document inside its source by the md5-derived hash (a
    * reproducible shuffle order — no RNG state), keep the first 8.
    * Keyed window + rank filter: capping 100 TB parallelizes by source
    * and never needs a global order or a count pass. */
  val q121SourceCap = Q(
    "q121_source_cap",
    (s, d) =>
      Curation.topNPerGroup(
          documents(s, d).withColumn("__h",
            Text.md5Hash64(col("doc_id").cast("string"), 13)),
          Seq("source"), Seq(col("__h"), col("doc_id")), n = 8)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("id_checksum"),
          sum(Text.tokenCount(col("text")).cast("long")).as("kept_tokens")),
    Some(s"""WITH t AS ($duckToksSql),
      h AS (
        SELECT d.doc_id, d.source, len(t.toks) AS n_tokens,
          row_number() OVER (PARTITION BY d.source ORDER BY
            ('0x' || substr(md5('13:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT,
            d.doc_id) AS rk
        FROM documents d JOIN t USING (doc_id))
      SELECT source, count(*) AS n_kept,
        CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
      FROM h WHERE rk <= 8 GROUP BY 1"""))

  /** Integrated curation sweep — the §3-style lifecycle for a training
    * corpus: Gopher-filter the documents, cap each source at 8 survivors
    * (hash order), split the kept set train/val/test, and report
    * per-split document and token budgets. Every stage is an
    * already-oracled operator (q117 -> q121 -> q103); the composition is
    * what a daily curation run executes, and the whole plan is map-only
    * until the one keyed rank window and final tiny groupBy. The
    * stopword rule runs with the CORPUS's stopword list (the config
    * input every deployment sets — q104's list for these tables;
    * Gopher's own English set keeps zero documents of this synthetic
    * vocabulary, which q117 reports per-rule). */
  val q122CurationSweep = Q(
    "q122_curation_sweep",
    (s, d) => {
      val kept = Curation.gopherFlags(documents(s, d), "text", stopwords)
        .where(col("pass_all"))
        .withColumn("__h", Text.md5Hash64(col("doc_id").cast("string"), 13))
      Curation.topNPerGroup(kept, Seq("source"),
          Seq(col("__h"), col("doc_id")), n = 8)
        .withColumn("split", Curation.hashSplit(col("doc_id")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          sum(col("n_words")).as("total_words"),
          sum(col("doc_id")).as("id_checksum"))
    },
    Some("""WITH base AS (
        SELECT doc_id, source, lang, text,
          trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
          CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = '' THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
          END AS toks,
          string_split(text, chr(10)) AS lines
        FROM documents),
      f AS (
        SELECT doc_id, source, len(toks) AS n_words
        FROM base
        WHERE len(toks) BETWEEN 50 AND 100000
          AND len(toks) > 0
          AND (length(norm) - (len(toks) - 1)) / len(toks) BETWEEN 3.0 AND 10.0
          AND len(regexp_extract_all(text, '#')) / len(toks) <= 0.1
          AND len(regexp_extract_all(text, '\.\.\.')) / len(toks) <= 0.1
          AND len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]')))
                / len(lines) <= 0.9
          AND len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                / len(lines) <= 0.3
          AND len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
                / len(toks) >= 0.8
          AND len(list_distinct(list_intersect(toks,
                ['the', 'a', 'and', 'of', 'in']))) >= 2),
      capped AS (
        SELECT doc_id, source, n_words,
          row_number() OVER (PARTITION BY source ORDER BY
            ('0x' || substr(md5('13:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
            doc_id) AS rk
        FROM f),
      sp AS (
        SELECT doc_id, source, n_words,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bucket
        FROM capped WHERE rk <= 8)
      SELECT CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split,
        count(*) AS n_docs,
        CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        CAST(sum(n_words) AS BIGINT) AS total_words,
        CAST(sum(doc_id) AS BIGINT) AS id_checksum
      FROM sp GROUP BY 1"""))

  /** One PageRank iteration as a DuckDB CTE triple — the same recurrence
    * [[graft.graph.Graph.pageRank]] runs (12-dp-rounded addends, exact
    * decimal sums, 12-dp-rounded new rank), unrolled once per round.
    * Each round's state is AS MATERIALIZED: round k+1 references s_k
    * three times, and DuckDB's default CTE inlining would otherwise
    * expand the chain to 3^rounds copies of the base scan. */
  private def pageRankRoundSql(prev: String, k: Int): String = s"""
      c$k AS (
        SELECT e.dst AS node,
          CAST(sum(CAST(round(s.rank / s.outdeg, 12) AS DECIMAL(28,12))) AS DOUBLE) AS in_sum
        FROM $prev s JOIN e ON s.node = e.src
        GROUP BY 1),
      d$k AS (
        SELECT coalesce(CAST(sum(CAST(round(rank, 12) AS DECIMAL(28,12))) AS DOUBLE), 0.0) AS mass
        FROM $prev WHERE outdeg IS NULL),
      s$k AS MATERIALIZED (
        SELECT s.node, s.outdeg, s.n,
          round(CAST(0.15 AS DOUBLE) / s.n + CAST(0.85 AS DOUBLE) *
            (coalesce(c.in_sum, 0.0) + d.mass / s.n), 12) AS rank
        FROM $prev s LEFT JOIN c$k c USING (node) CROSS JOIN d$k d)"""

  /** One CONVERGED-PageRank iteration as gated DuckDB CTEs — the
    * fixed-point emulation that makes a data-dependent stop expressible
    * in plain SQL: each round's state carries (delta, iters, stopped);
    * an un-stopped round runs the exact [[pageRankRoundSql]] recurrence,
    * computes its own L1 delta Σ round(|rank − prev|, 12) with exact
    * decimal summation (bit-identical to
    * [[graft.graph.Graph.pageRankConverged]]'s), and freezes
    * (delta, iters, stopped=true) once delta < tol; a stopped round
    * passes state through unchanged, so unrolling `maxIter` rounds
    * yields exactly the state, round count and stop delta the Spark
    * loop returns. Post-stop rounds see empty c/d aggregates (the NOT
    * stopped filters) — pass-through is near-free. */
  private def pageRankConvergedRoundSql(k: Int, tol: Double): String = {
    val p = s"cs${k - 1}"
    s"""
      cc$k AS (
        SELECT e.dst AS node,
          CAST(sum(CAST(round(s.rank / s.outdeg, 12) AS DECIMAL(28,12))) AS DOUBLE) AS in_sum
        FROM $p s JOIN e ON s.node = e.src
        WHERE NOT s.stopped GROUP BY 1),
      cd$k AS (
        SELECT coalesce(CAST(sum(CAST(round(rank, 12) AS DECIMAL(28,12))) AS DOUBLE), 0.0) AS mass
        FROM $p WHERE outdeg IS NULL AND NOT stopped),
      ct$k AS MATERIALIZED (
        SELECT s.node, s.outdeg, s.n, s.stopped, s.iters, s.delta AS pdelta,
          s.rank AS prev,
          CASE WHEN s.stopped THEN s.rank
               ELSE round(CAST(0.15 AS DOUBLE) / s.n + CAST(0.85 AS DOUBLE) *
                 (coalesce(c.in_sum, 0.0) + d.mass / s.n), 12) END AS rank
        FROM $p s LEFT JOIN cc$k c USING (node) CROSS JOIN cd$k d),
      cg$k AS (
        SELECT CAST(sum(CAST(round(abs(rank - prev), 12) AS DECIMAL(28,12))) AS DOUBLE) AS nd
        FROM ct$k WHERE NOT stopped),
      cs$k AS MATERIALIZED (
        SELECT node, outdeg, n, rank,
          CASE WHEN stopped THEN pdelta ELSE g.nd END AS delta,
          CASE WHEN stopped THEN iters ELSE $k END AS iters,
          stopped OR g.nd < CAST($tol AS DOUBLE) AS stopped
        FROM ct$k CROSS JOIN cg$k g)"""
  }

  /** PageRank over the customer->supplier referral graph (distinct
    * (o_custkey, l_suppkey) pairs) — the web-graph importance ranker a
    * crawl-curation pipeline runs over its domain/link graph (Page et
    * al. 1999; Common Crawl ships host-level ranks of this family).
    * Every supplier is a sink, so the dangling-mass redistribution path
    * is exercised on real data, not just in the unit spec. Top 30
    * suppliers by rank; the oracle replays the identical 6-round
    * recurrence as unrolled CTEs and the ranks hash-match at 12 dp. */
  val q123PageRank = Q(
    "q123_pagerank",
    (s, d) => {
      val e = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.graph.Graph.pageRank(e, iterations = 6)
        .where(col("node").startsWith("s"))
        .orderBy(col("rank").desc, col("node"))
        .limit(30)
        .select(col("node"), round(col("rank"), 12).as("rank"))
    },
    Some(s"""WITH e AS MATERIALIZED (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
          's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
      m AS (SELECT count(*) AS n FROM nodes),
      s0 AS MATERIALIZED (
        SELECT nd.node, dg.outdeg, m.n,
          round(CAST(1.0 AS DOUBLE) / m.n, 12) AS rank
        FROM nodes nd LEFT JOIN deg dg USING (node) CROSS JOIN m),
      ${(1 to 6).map(k => pageRankRoundSql(s"s${k - 1}", k)).mkString(",\n")}
      SELECT node, rank FROM s6
      WHERE node LIKE 's%'
      ORDER BY rank DESC, node LIMIT 30"""))

  /** Weighted sampling without replacement per language (Efraimidis-
    * Spirakis keys over n_chars): 12 docs per lang, long documents
    * proportionally likelier — the token-budget subsample a plain
    * hash-frac filter cannot express. The oracle replays the identical
    * md5-derived uniforms and pow keys, so the selected SET (not just
    * counts) hash-matches. */
  val q124WeightedSample = Q(
    "q124_weighted_sample",
    (s, d) =>
      Packing.weightedSample(documents(s, d), "doc_id", Seq("lang"),
          "n_chars", k = 12, salt = 7)
        .select(col("lang"), col("es_rank"), col("doc_id"), col("n_chars")),
    Some("""WITH p AS (
        SELECT lang, doc_id, n_chars,
          pow(CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                % 4294967296 + 1 AS DOUBLE) / CAST(4294967297 AS DOUBLE),
              CAST(1.0 AS DOUBLE) / n_chars) AS pr
        FROM documents WHERE n_chars > 0),
      r AS (
        SELECT lang, doc_id, n_chars,
          row_number() OVER (PARTITION BY lang ORDER BY pr DESC, doc_id) AS es_rank
        FROM p)
      SELECT lang, es_rank, doc_id, n_chars FROM r WHERE es_rank <= 12"""))

  /** C4-style boilerplate line removal (q85's deterministic-augmentation
    * pattern: the corpus is single-line word soup, so each doc is first
    * re-wrapped into 10-word lines with id-derived variation — every
    * (doc_id+i)%5==0 line gets nav-menu chrome, every remaining
    * (doc_id+i)%3==0 line a terminal '.'), then [[Corpus.lineClean]]
    * applies the published line rules. Page build + clean is ONE
    * map-side HOF projection — no explode, no shuffle. */
  val q125LineClean = Q(
    "q125_line_clean",
    (s, d) => {
      val toks = split(col("text"), " ")
      val nLines = ceil(size(toks) / lit(10.0)).cast("int")
      val page = array_join(
        transform(sequence(lit(0), nLines - 1), i =>
          concat(
            array_join(slice(toks, i * lit(10) + lit(1), lit(10)), " "),
            when((col("doc_id") + i) % 5 === 0, lit(" | home | about | contact"))
              .when((col("doc_id") + i) % 3 === 0, lit("."))
              .otherwise(lit("")))), "\n")
      Corpus.lineClean(
          documents(s, d).where(size(toks) > 0)
            .select(col("doc_id"), page.as("page")),
          "page")
        .select(col("doc_id"), col("n_lines"), col("n_kept"),
          length(col("cleaned")).as("kept_chars"),
          md5(col("cleaned")).as("cleaned_md5"))
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) > 0),
      pg AS (
        SELECT doc_id, array_to_string(
          list_transform(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)), i ->
            array_to_string(list_slice(toks, i * 10 + 1, i * 10 + 10), ' ') ||
            CASE WHEN (doc_id + i) % 5 = 0 THEN ' | home | about | contact'
                 WHEN (doc_id + i) % 3 = 0 THEN '.'
                 ELSE '' END), chr(10)) AS page
        FROM base),
      cl AS (
        SELECT doc_id, string_split(page, chr(10)) AS lines,
          list_filter(string_split(page, chr(10)), l ->
            regexp_matches(l, '[.!?"]\s*$') AND len(trim(l)) >= 30
            AND len(string_split_regex(trim(l), '\s+')) >= 3) AS kept
        FROM pg),
      j AS (
        -- array_to_string of an EMPTY list is NULL in DuckDB but '' in
        -- Spark's array_join: coalesce to keep md5/length comparable
        SELECT doc_id, lines, kept,
          coalesce(array_to_string(kept, chr(10)), '') AS cleaned
        FROM cl)
      SELECT doc_id, CAST(len(lines) AS INT) AS n_lines,
        CAST(len(kept) AS INT) AS n_kept,
        CAST(length(cleaned) AS INT) AS kept_chars,
        md5(cleaned) AS cleaned_md5
      FROM j"""))

  /** Type-contract pin for the round-5 regression class: events written
    * back out as parquet TIMESTAMP_NTZ (isAdjustedToUTC=false — exactly
    * the encoding the driver's testdata moved to), read back so Spark
    * types the column `TimestampNTZType`, then pushed through window
    * arithmetic using the engine's via-timestamp cast convention. If any
    * step in the chain rejects NTZ, this query errs at the driver gate
    * itself — the canary the unit suite alone could not be
    * (TimestampTypeCanarySpec analyzes; this executes + hash-compares).
    * UTC session ⇒ the NTZ wall-clock values equal DuckDB's naive read
    * of the original events table, so the oracle needs no fixture. */
  val q126NtzRoundtrip = Q(
    "q126_ntz_roundtrip",
    (s, d) => {
      val tag = d.replaceAll(".*/", "")
      val path = graft.sources.Scratch.dir(s"ntz_$tag")
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("ts", col("ts").cast("timestamp_ntz"))
        .write.mode("overwrite").parquet(path)
      val ntz = s.read.parquet(path)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      ntz
        .withColumn("gap_s",
          col("ts").cast("timestamp").cast("double") -
            lag(col("ts"), 1).over(w).cast("timestamp").cast("double"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          round(sum(col("gap_s").cast("decimal(18,6)")).cast("double") /
            count(col("gap_s")), 4).as("mean_gap_s"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
    },
    Some("""WITH g AS (
        SELECT user_id, ts, event_id,
          epoch(ts) - epoch(lag(ts) OVER (
            PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
        FROM events)
      SELECT user_id, count(*) AS n,
        round(CAST(sum(CAST(gap_s AS DECIMAL(18,6))) AS DOUBLE)
          / count(gap_s), 4) AS mean_gap_s,
        min(ts) AS first_ts, max(ts) AS last_ts
      FROM g GROUP BY 1"""))

  /** SemDeDup scored over PQ codes — the quantized rerank at the
    * semantic-dedup call site (the r05 verdict's stretch item): k-means
    * buckets bound the pair join exactly as in q96, but the compare side
    * ships the trained-codebook PQ codes and cosine is scored raw vs
    * [[graft.operators.Quantization.decode]]'d — the ADC estimate. At
    * 100 TB the codes table is the persisted index: the quadratic side
    * of the join moves 8 small ints per candidate instead of 64 floats.
    * Oracle replays kmeans (q93 CTEs), PQ training (q119 CTEs), the
    * encode, and per-id reconstruction, then the same keep-first rule. */
  val q127SemdedupPq = Q(
    "q127_semdedup_pq",
    (s, d) => {
      import graft.operators.{Clustering, Quantization}
      val e = embeddings(s, d)
      val cb = Quantization.trainCodebook(e, "vec_id", "embedding",
        k = 16, m = 8, dims = 64, iters = 2)
      Clustering.semDeDupPq(e, "vec_id", "embedding", k = 8, iters = 2,
        codebook = cb, m = 8, dims = 64, threshold = 0.4)
    },
    Some(s"""WITH p AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      k0 AS (SELECT vec_id, v FROM p ORDER BY vec_id LIMIT 8),
      c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
        FROM k0),
      ${kmeansRoundSql("c0", 1)},
      ${kmeansRoundSql("c1", 2)},
      a3 AS (
        SELECT p.vec_id,
          min(struct_pack(d := round(list_aggregate(list_transform(range(1, 65),
              i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i])), 'sum'), 6),
            c := c.cid)) AS best
        FROM p CROSS JOIN c2 c GROUP BY p.vec_id),
      j AS (
        SELECT a.vec_id, CAST(a.best.c AS BIGINT) AS cluster, p.v
        FROM a3 a JOIN p USING (vec_id)),
      ms AS (SELECT unnest(range(0, 8)) AS m),
      cb0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, v AS cv
        FROM (SELECT vec_id, v FROM p ORDER BY vec_id LIMIT 16)),
      ${pqTrainRoundSql("cb0", 1)},
      ${pqTrainRoundSql("cb1", 2)},
      enc AS (
        SELECT p.vec_id, ms.m,
          min(struct_pack(d := round(list_aggregate(list_transform(range(1, 9),
              i -> (p.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i]) *
                   (p.v[ms.m * 8 + i] - cb.cv[ms.m * 8 + i])), 'sum'), 6),
            c := cb.k)) AS best
        FROM p CROSS JOIN ms CROSS JOIN cb2 cb GROUP BY 1, 2),
      rec AS (
        SELECT e.vec_id,
          flatten(list(list_slice(cb.cv, e.m * 8 + 1, e.m * 8 + 8)
            ORDER BY e.m)) AS vhat
        FROM enc e JOIN cb2 cb ON cb.k = e.best.c
        GROUP BY 1),
      drp AS (
        SELECT DISTINCT b.vec_id
        FROM j a JOIN j b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN rec r ON r.vec_id = b.vec_id
        WHERE list_cosine_similarity(a.v, r.vhat) >= 0.4)
      SELECT vec_id, cluster,
        vec_id NOT IN (SELECT vec_id FROM drp) AS kept
      FROM j"""))

  /** CCNet's selection step proper (Wenzek et al. 2020 §4.3): split each
    * language's documents into equal head/middle/tail thirds by LM
    * perplexity — head is the cleanest slice, tail is usually discarded.
    * Composes q115's bigram-LM scorer with a per-lang ntile(3) over the
    * total order (avg_nll, doc_id). Unscored documents (<2 tokens) carry
    * no perplexity and take no bucket, as in the paper's pipeline.
    * Scale shape: the scorer is q115's (corpus-scaled bigram dim joined,
    * never broadcast); the bucketing is a per-language window — at
    * 100 TB you replace ntile with approx-percentile CUTOFFS per
    * language (two numbers) and a map-only comparison, the same
    * window-to-broadcast swap the sketches family documents. */
  val q128CcnetBuckets = Q(
    "q128_ccnet_buckets",
    (s, d) => {
      val docs = documents(s, d)
      val scored = graft.operators.LangModel.bigramNll(docs, "doc_id", "text",
        Curation.hashSplit(col("doc_id")) === "train")
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("avg_nll"), col("doc_id"))
      docs.select(col("doc_id"), col("lang"))
        .join(scored, "doc_id")
        .withColumn("bucket",
          element_at(array(lit("head"), lit("middle"), lit("tail")),
            ntile(3).over(w)))
        .select(col("doc_id"), col("lang"), col("avg_nll"), col("bucket"))
    },
    Some(s"""WITH t AS ($duckToksSql),
      ref AS (
        SELECT doc_id, toks FROM t
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 80),
      uni AS (
        SELECT w, count(*) AS c1
        FROM (SELECT unnest(toks) AS w FROM ref) GROUP BY 1),
      v AS (SELECT count(*) AS v FROM uni),
      bi AS (
        SELECT bg, count(*) AS c12 FROM (
          SELECT toks[i] || ' ' || toks[i + 1] AS bg
          FROM (SELECT toks, unnest(range(1, len(toks))) AS i
                FROM ref WHERE len(toks) >= 2))
        GROUP BY 1),
      db AS (
        SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS bg
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
              FROM t WHERE len(toks) >= 2)),
      sc AS (
        SELECT db.doc_id,
          CAST(round(-ln((coalesce(bi.c12, 0) + 1.0) /
                         (coalesce(uni.c1, 0) + v.v)), 9) AS DECIMAL(28,9)) AS nll
        FROM db LEFT JOIN bi USING (bg)
                LEFT JOIN uni ON db.w1 = uni.w
                CROSS JOIN v),
      scored AS (
        SELECT doc_id, round(CAST(sum(nll) AS DOUBLE) / count(*), 6) AS avg_nll
        FROM sc GROUP BY 1)
      SELECT s.doc_id, d.lang, s.avg_nll,
        CASE ntile(3) OVER (PARTITION BY d.lang ORDER BY s.avg_nll, s.doc_id)
          WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
      FROM scored s JOIN documents d USING (doc_id)"""))

  /** Bloom-filter incremental membership (Bloom 1970) — the cross-batch
    * dedup pattern q101's anti-join cannot give you when yesterday's key
    * set no longer fits a join: build the bitmap over the "seen" slice
    * (one explode + bit_or partial agg, collect bounded at mBits/64
    * longs — 256 bytes at this query's m=2048), then test the new
    * slice MAP-SIDE against the
    * literal bitmap — no join against the seen keys at all. Output is
    * the (bloom_hit, exact_seen) confusion matrix vs the exact equality
    * join; the no-false-negatives guarantee means the
    * (false, true) cell must be absent, and the oracle replays the
    * identical md5-position bit math so the FP count is pinned too. */
  val q129BloomMembership = Q(
    "q129_bloom_membership",
    (s, d) => {
      import graft.operators.Sketches
      val docs = documents(s, d)
        // membership key: the document's leading trigram — full-text
        // keys have zero cross-split overlap in the synthetic corpus,
        // which would leave the matrix's hit cells empty and the
        // guarantee untested
        .withColumn("__key",
          array_join(slice(split(col("text"), " "), 1, 3), " "))
      val isSeen = Curation.hashSplit(col("doc_id")) === "train"
      val seen = docs.where(isSeen)
      // m sized for a VISIBLE false-positive cell at gate scale (load
      // ~0.6 -> FP ~8%): the oracle pins the exact count, so the rate
      // is an assertion, not an accident
      val m = 2048
      val seeds = Seq(1, 2, 3)
      val bitmap = Sketches.bloomBitmap(seen, col("__key"), m, seeds)
      val exact = seen.select(col("__key")).distinct()
        .withColumn("__seen", lit(true))
      docs.where(!isSeen)
        .withColumn("bloom_hit",
          Sketches.bloomMightContain(col("__key"), bitmap, m, seeds))
        .join(exact, Seq("__key"), "left")
        .groupBy(col("bloom_hit"),
          coalesce(col("__seen"), lit(false)).as("exact_seen"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""WITH lbl AS (
        SELECT doc_id,
          array_to_string(string_split(text, ' ')[1:3], ' ') AS k,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 80
            AS is_seen
        FROM documents),
      sds AS (SELECT unnest([1, 2, 3]) AS s),
      -- UBIGINT bit math: DuckDB's signed << traps on 1 << 63, and
      -- OR/AND are bit-pattern identical either way (bm is internal,
      -- so the signedness never reaches the compared output)
      bm AS (
        SELECT p // 64 AS w, bit_or(1::UBIGINT << CAST(p % 64 AS INT)) AS bits
        FROM (
          SELECT ('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || k), 1, 15))::BIGINT
                   % 2048 AS p
          FROM lbl CROSS JOIN sds WHERE is_seen)
        GROUP BY 1),
      probe AS (SELECT doc_id, k FROM lbl WHERE NOT is_seen),
      hits AS (
        SELECT doc_id, bool_and(
          (COALESCE(bm.bits, 0::UBIGINT) & (1::UBIGINT << CAST(pp.p % 64 AS INT))) <> 0)
          AS bloom_hit
        FROM (
          SELECT doc_id,
            ('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || k), 1, 15))::BIGINT
              % 2048 AS p
          FROM probe CROSS JOIN sds) pp
        LEFT JOIN bm ON bm.w = pp.p // 64
        GROUP BY 1),
      ex AS (
        SELECT DISTINCT p.doc_id
        FROM probe p JOIN (SELECT DISTINCT k FROM lbl WHERE is_seen) sn
          ON p.k = sn.k)
      SELECT h.bloom_hit, h.doc_id IN (SELECT doc_id FROM ex) AS exact_seen,
        count(*) AS n
      FROM hits h GROUP BY 1, 2"""))

  /** Count-min frequency estimates vs exact counts (Cormode &
    * Muthukrishnan 2005) — the heavy-hitter / skew-diagnosis sketch: a
    * depth-4 x width-256 counter matrix built in one explode +
    * bounded-output counting groupBy, collected (4 KiB), then every
    * distinct key's frequency estimated MAP-SIDE (4 literal lookups +
    * min, no join). The output compares estimate to exact per key:
    * `over >= 0` for every row is the CMS one-sided guarantee, and the
    * oracle replays the identical md5-position math so the exact
    * overestimates (hash-collision sums at width 256 under ~400 keys)
    * are pinned, not approximated. Top-20 by exact count keeps the
    * output stable across SFs. */
  val q130CmsFrequency = Q(
    "q130_cms_frequency",
    (s, d) => {
      import graft.operators.Sketches
      val docs = documents(s, d)
        .withColumn("__key",
          array_join(slice(split(col("text"), " "), 1, 2), " "))
      val width = 256
      val seeds = Seq(11, 12, 13, 14)
      val cms = Sketches.cmsTable(docs, col("__key"), width, seeds)
      docs.groupBy(col("__key").as("k"))
        .agg(count(lit(1)).as("n_exact"))
        .withColumn("n_est", Sketches.cmsEstimate(col("k"), cms, width, seeds))
        .withColumn("over", col("n_est") - col("n_exact"))
        .orderBy(col("n_exact").desc, col("k")).limit(20)
    },
    Some("""WITH ks AS (
        SELECT array_to_string(string_split(text, ' ')[1:2], ' ') AS k
        FROM documents),
      sds AS (SELECT unnest([11, 12, 13, 14]) AS s,
                     unnest([0, 1, 2, 3]) AS dd),
      cms AS (
        SELECT dd, ('0x' || substr(md5(CAST(s AS VARCHAR) || ':' || k), 1, 15))::BIGINT
                 % 256 AS w, count(*) AS n
        FROM ks CROSS JOIN sds GROUP BY 1, 2),
      ex AS (SELECT k, count(*) AS n_exact FROM ks GROUP BY 1),
      est AS (
        SELECT ex.k, ex.n_exact, min(COALESCE(cms.n, 0)) AS n_est
        FROM ex CROSS JOIN sds
        LEFT JOIN cms ON cms.dd = sds.dd AND cms.w =
          ('0x' || substr(md5(CAST(sds.s AS VARCHAR) || ':' || ex.k), 1, 15))::BIGINT % 256
        GROUP BY 1, 2)
      SELECT k, n_exact, n_est, n_est - n_exact AS over
      FROM est ORDER BY n_exact DESC, k LIMIT 20"""))

  /** One BPE training round in DuckDB: freq-weighted adjacent-pair
    * counts (`pc`), the deterministic winner (`m` — max count, ties to
    * the lexicographically smallest pair), and the greedy left-to-right
    * merge as a RECURSIVE CTE walking each word's symbol array with the
    * same (out, skip) semantics as [[graft.operators.Bpe.mergePair]]
    * (`r` steps i by 2 over a merged pair, 1 otherwise; `s` keeps the
    * finished rows). */
  private def bpeRoundSql(prev: String, n: Int): String = s"""
      pc$n AS (
        SELECT syms[i] AS a, syms[i + 1] AS b, CAST(sum(freq) AS BIGINT) AS cnt
        FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
              FROM $prev)
        GROUP BY 1, 2),
      m$n AS (SELECT a, b, cnt FROM pc$n ORDER BY cnt DESC, a, b LIMIT 1),
      r$n AS (
        SELECT word, freq, syms, CAST([] AS VARCHAR[]) AS out, 1 AS i FROM $prev
        UNION ALL
        SELECT word, freq, syms,
          CASE WHEN i < len(syms) AND syms[i] = m.a AND syms[i + 1] = m.b
            THEN list_append(out, m.a || m.b) ELSE list_append(out, syms[i]) END,
          CASE WHEN i < len(syms) AND syms[i] = m.a AND syms[i + 1] = m.b
            THEN i + 2 ELSE i + 1 END
        FROM r$n, m$n m WHERE i <= len(syms)),
      s$n AS (SELECT word, freq, out AS syms FROM r$n WHERE i = len(syms) + 1)"""

  /** BPE merge training (Sennrich et al., ACL 2016) — learn the first 4
    * merges of the corpus' subword vocabulary: the vocabulary-induction
    * stage q60's segmentation presupposes. Corpus-scale text collapses
    * to the vocabulary-scale (word, freq, symbols) state in one pass;
    * each round is a freq-weighted pair count (one bounded-output
    * shuffle), a one-row winner collect, and a map-side greedy merge
    * fold. Output is the learned merge table itself — both engines
    * replay the identical recurrence (the oracle's per-round recursive
    * CTE IS the fold), so the table hash-matches, chains and all. */
  val q131BpeTrain = Q(
    "q131_bpe_train",
    (s, d) => {
      import s.implicits._
      graft.operators.Bpe.train(documents(s, d), "text", rounds = 4)
        .toDF("r", "s1", "s2", "cnt")
    },
    Some(s"""WITH RECURSIVE t AS ($duckToksSql),
      w0 AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(toks) AS w FROM t)
        WHERE w <> '' GROUP BY 1),
      s0 AS (
        SELECT word, freq,
          list_append(list_transform(generate_series(1, length(word)),
            i -> substr(word, CAST(i AS INT), 1)), '</w>') AS syms
        FROM w0),
      ${(1 to 4).map(i => bpeRoundSql(s"s${i - 1}", i)).mkString(",\n")}
      SELECT * FROM (
        ${(1 to 4).map(i =>
          s"SELECT CAST($i AS INT) AS r, a AS s1, b AS s2, cnt FROM m$i")
          .mkString(" UNION ALL ")})
      ORDER BY r"""))

  /** Bottom-k (KMV) quantile sketch vs exact percentiles (Bar-Yossef et
    * al. 2002; DKW bound for the sample-quantile error) — the fourth
    * mergeable sketch: HLL = how many distinct, Bloom = seen before,
    * CMS = how often, bottom-k = WHERE in the distribution. The sample
    * is the k smallest md5-hashes (TakeOrderedAndProject: per-partition
    * partial top-k, no shuffle), quantiles are its order statistics
    * computed under the Guards bounded-window contract, and the exact
    * side reuses q34's proven percentile/quantile_cont parity. The
    * oracle replays the identical hash ordering, so est, exact, AND the
    * error column are pinned values, not approximations. */
  val q132QuantileSketch = Q(
    "q132_quantile_sketch",
    (s, d) => {
      import graft.operators.Sketches
      val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
      val ev = events(s, d)
      val sample = Sketches.bottomKSample(ev, col("event_id"), col("value"),
        k = 256, seed = 7)
      val est = Sketches.sampleQuantiles(sample, qs)
      val exact = ev
        .where(col("value").isNotNull && !isnan(col("value")))
        .agg(count(lit(1)).as("n_total"),
          expr(s"percentile(value, array(${qs.mkString(",")}))").as("ex"))
        .select(col("n_total"), posexplode(col("ex")).as(Seq("i", "exact")))
        .select(element_at(array(qs.map(lit): _*), col("i") + 1).as("q"),
          col("exact"), col("n_total"))
      est.join(broadcast(exact), Seq("q"))
        .select(col("q"), round(col("est"), 4).as("est"),
          round(col("exact"), 4).as("exact"),
          round(abs(col("est") - col("exact")), 4).as("abs_err"),
          col("n_sample"), col("n_total"))
    },
    Some("""WITH smp AS (
        SELECT CAST(value AS DOUBLE) AS v,
          ('0x' || substr(md5('7:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)
        ORDER BY h, v LIMIT 256),
      r AS (
        SELECT v, row_number() OVER (ORDER BY v, h) AS rn,
          count(*) OVER () AS ns
        FROM smp),
      qs AS (SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q),
      est AS (
        SELECT q, v AS est, ns AS n_sample
        FROM r CROSS JOIN qs
        WHERE rn = greatest(1, CAST(ceil(q * ns) AS BIGINT))),
      ex0 AS (
        SELECT quantile_cont(value, [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS exs,
          count(*) AS n_total
        FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
      ex AS (
        SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
          unnest(exs) AS exact, n_total
        FROM ex0)
      SELECT est.q, round(est.est, 4) AS est, round(ex.exact, 4) AS exact,
        round(abs(est.est - ex.exact), 4) AS abs_err,
        est.n_sample, ex.n_total
      FROM est JOIN ex USING (q)"""))

  /** Multinomial Naive Bayes classifier, trained and applied in-engine
    * (McCallum & Nigam 1998) — the cheap-classifier curation stage: fit
    * token log-likelihoods for `lang` on the hash-split train partition,
    * score every held-out document with one vocabulary-keyed join, and
    * report the confusion matrix. Both engines replay the identical
    * add-one-smoothed 9-dp decimal scores and the (score DESC, label
    * DESC) tie-break, so the per-document argmax — not just the counts —
    * is pinned. */
  val q133NaiveBayes = Q(
    "q133_naive_bayes",
    (s, d) => {
      import graft.operators.Classify
      val docs = documents(s, d)
      val isTrain = Curation.hashSplit(col("doc_id")) === "train"
      val model = Classify.nbTrain(docs.where(isTrain), "text", "lang")
      val preds = Classify.nbPredict(docs.where(!isTrain), "doc_id", "text",
        model)
      docs.where(!isTrain).select(col("doc_id"), col("lang").as("true_lang"))
        .join(preds, Seq("doc_id"))
        .groupBy(col("true_lang"), col("pred").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
    },
    Some(s"""WITH t AS ($duckToksSql),
      lbl AS (
        SELECT doc_id, lang,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 < 80
            AS is_train
        FROM documents),
      tk AS (
        SELECT l.doc_id, l.lang, l.is_train, unnest(t.toks) AS tok
        FROM t JOIN lbl l USING (doc_id)),
      tr AS (SELECT * FROM tk WHERE is_train),
      cnts AS (SELECT lang, tok, count(*) AS cnt FROM tr GROUP BY 1, 2),
      cls AS (SELECT lang, count(*) AS n_toks FROM tr GROUP BY 1),
      nd AS (SELECT lang, count(*) AS n_docs FROM lbl WHERE is_train GROUP BY 1),
      v AS (SELECT count(DISTINCT tok) AS v FROM cnts),
      tot AS (SELECT sum(n_docs) AS n_total FROM nd),
      model AS (
        SELECT cls.lang,
          CAST(round(ln(nd.n_docs * 1.0 / tot.n_total), 9) AS DECIMAL(28,9)) AS prior,
          CAST(round(ln(1.0 / (cls.n_toks + v.v)), 9) AS DECIMAL(28,9)) AS unseen
        FROM cls JOIN nd USING (lang) CROSS JOIN v CROSS JOIN tot),
      lik AS (
        SELECT c.lang, c.tok,
          CAST(round(ln((c.cnt + 1.0) / (cls.n_toks + v.v)), 9) AS DECIMAL(28,9)) AS llik
        FROM cnts c JOIN cls USING (lang) CROSS JOIN v),
      ted AS (SELECT doc_id, lang AS true_lang FROM lbl WHERE NOT is_train),
      te AS (SELECT doc_id, tok FROM tk WHERE NOT is_train),
      tsum AS (
        SELECT te.doc_id, m.lang, sum(COALESCE(l.llik, m.unseen)) AS ssum
        FROM te CROSS JOIN model m
        LEFT JOIN lik l ON l.lang = m.lang AND l.tok = te.tok
        GROUP BY 1, 2),
      sc AS (
        SELECT d.doc_id, d.true_lang, m.lang AS cand,
          m.prior + COALESCE(s.ssum, 0) AS score
        FROM ted d CROSS JOIN model m
        LEFT JOIN tsum s ON s.doc_id = d.doc_id AND s.lang = m.lang),
      pr AS (
        SELECT doc_id, true_lang, cand AS pred_lang
        FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, cand DESC) AS rn
          FROM sc)
        WHERE rn = 1)
      SELECT true_lang, pred_lang, count(*) AS n
      FROM pr GROUP BY 1, 2"""))

  /** One HITS iteration in DuckDB: authority half-step (hub sums by dst,
    * L1 total, normalize + round 12) then the mirror hub half-step —
    * the exact [[graft.graph.Graph.hits]] recurrence, MATERIALIZED per
    * half-step like the PageRank chain. */
  private def hitsRoundSql(prev: String, k: Int): String = s"""
      ar$k AS (
        SELECT e.dst AS node,
          CAST(sum(CAST(round(s.hub, 12) AS DECIMAL(28,12))) AS DOUBLE) AS raw
        FROM $prev s JOIN e ON s.node = e.src
        GROUP BY 1),
      at$k AS (
        SELECT CAST(sum(CAST(round(raw, 12) AS DECIMAL(28,12))) AS DOUBLE) AS tot
        FROM ar$k),
      sa$k AS MATERIALIZED (
        SELECT s.node, s.hub, round(coalesce(a.raw, 0.0) / t.tot, 12) AS auth
        FROM $prev s LEFT JOIN ar$k a USING (node) CROSS JOIN at$k t),
      hr$k AS (
        SELECT e.src AS node,
          CAST(sum(CAST(round(s.auth, 12) AS DECIMAL(28,12))) AS DOUBLE) AS raw
        FROM sa$k s JOIN e ON s.node = e.dst
        GROUP BY 1),
      ht$k AS (
        SELECT CAST(sum(CAST(round(raw, 12) AS DECIMAL(28,12))) AS DOUBLE) AS tot
        FROM hr$k),
      s$k AS MATERIALIZED (
        SELECT s.node, round(coalesce(h.raw, 0.0) / t.tot, 12) AS hub, s.auth
        FROM sa$k s LEFT JOIN hr$k h USING (node) CROSS JOIN ht$k t)"""

  /** HITS hubs/authorities (Kleinberg 1999) on the customer->supplier
    * graph — q123's companion ranker: hubs score the buyers that point
    * at important suppliers, authorities the suppliers pointed at by
    * good hubs. Sum-normalized half-steps keep the whole iteration
    * inside the decimal(28,12) regime (no sqrt), so 4 unrolled rounds
    * hash-match the oracle bit-for-bit; the bipartite shape exercises
    * both zero paths (suppliers have hub 0, customers auth 0). */
  val q134Hits = Q(
    "q134_hits",
    (s, d) => {
      val e = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val st = graft.graph.Graph.hits(e, iterations = 4)
      val auths = st.orderBy(col("auth").desc, col("node")).limit(15)
        .select(lit("auth").as("kind"), col("node"),
          round(col("auth"), 12).as("score"))
      val hubs = st.orderBy(col("hub").desc, col("node")).limit(15)
        .select(lit("hub").as("kind"), col("node"),
          round(col("hub"), 12).as("score"))
      auths.unionByName(hubs)
    },
    Some(s"""WITH e AS MATERIALIZED (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
          's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      m AS (SELECT count(*) AS n FROM nodes),
      s0 AS MATERIALIZED (
        SELECT node, round(CAST(1.0 AS DOUBLE) / m.n, 12) AS hub,
          round(CAST(1.0 AS DOUBLE) / m.n, 12) AS auth
        FROM nodes CROSS JOIN m),
      ${(1 to 4).map(k => hitsRoundSql(s"s${k - 1}", k)).mkString(",\n")}
      SELECT * FROM (
        SELECT 'auth' AS kind, node, round(auth, 12) AS score FROM s4
        ORDER BY auth DESC, node LIMIT 15)
      UNION ALL
      SELECT * FROM (
        SELECT 'hub' AS kind, node, round(hub, 12) AS score FROM s4
        ORDER BY hub DESC, node LIMIT 15)"""))

  /** TF-IDF weighted cosine near-dup pairs (Salton & Buckley 1988;
    * rare-token blocking from the Bayardo et al. 2007 all-pairs family)
    * — the weighted counterpart to q107's set Jaccard: distinctive
    * shared vocabulary outweighs boilerplate. Candidates come from an
    * equi-join restricted to tokens with df in [2, 10] (bounded fan-out
    * per key at any corpus size); the cosine is computed over the
    * candidates' COMPLETE vectors with exact-decimal dot products and
    * norms, so the only float math is the final sqrt/divide — IEEE-
    * identical on both engines, making the top-20 cut deterministic. */
  val q135TfidfCosine = Q(
    "q135_tfidf_cosine",
    (s, d) =>
      Dedup.tfidfCosinePairs(documents(s, d), "doc_id", "text", n = 3,
          dfMax = 10)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
        .orderBy(col("cos").desc, col("id_a"), col("id_b")).limit(20),
    Some(s"""WITH t AS ($duckToksSql),
      tf AS (
        SELECT doc_id AS id, array_to_string(toks[i : i + 2], ' ') AS tok,
          count(*) AS tf
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
              FROM t WHERE len(toks) >= 3)
        GROUP BY 1, 2),
      dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
      idf AS (
        SELECT tok, df,
          CAST(round(ln((nd.n_docs + 1.0) / (df + 1.0)) + 1.0, 9)
            AS DECIMAL(18,9)) AS idf
        FROM dfreq CROSS JOIN nd),
      w AS (
        SELECT tf.id, tf.tok, idf.df,
          CAST(CAST(tf.tf AS DECIMAL(9,0)) * idf.idf AS DECIMAL(18,9)) AS w
        FROM tf JOIN idf USING (tok)),
      norms AS (SELECT id, sum(w * w) AS sn FROM w GROUP BY 1),
      rare AS (SELECT id, tok FROM w WHERE df BETWEEN 2 AND 10),
      cand AS (
        SELECT DISTINCT a.id AS a, b.id AS b
        FROM rare a JOIN rare b USING (tok) WHERE a.id < b.id),
      dots AS (
        SELECT c.a, c.b, sum(wa.w * wb.w) AS dot
        FROM cand c
        JOIN w wa ON wa.id = c.a
        JOIN w wb ON wb.id = c.b AND wb.tok = wa.tok
        GROUP BY 1, 2),
      cs AS (
        SELECT d.a AS id_a, d.b AS id_b,
          CAST(d.dot AS DOUBLE) /
            (sqrt(CAST(na.sn AS DOUBLE)) * sqrt(CAST(nb.sn AS DOUBLE))) AS c
        FROM dots d
        JOIN norms na ON na.id = d.a
        JOIN norms nb ON nb.id = d.b)
      SELECT id_a, id_b, round(c, 6) AS cos
      FROM cs ORDER BY round(c, 6) DESC, id_a, id_b LIMIT 20"""))

  /** Ordered conversion funnel with a 7-day completion window
    * (ClickHouse windowFunnel semantics, greedy first-match) —
    * view -> click -> purchase over the event stream, counting users by
    * deepest level reached. Each funnel step is one user-keyed
    * equi-join + min aggregation: at scale the whole funnel
    * co-partitions on the entity key with no windows over the raw
    * stream. */
  val q136Funnel = Q(
    "q136_funnel",
    (s, d) => {
      import graft.operators.Funnel
      val ev = events(s, d)
      val lv = Funnel.windowFunnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), "INTERVAL 7 DAY")
      ev.select(col("user_id").as("entity")).distinct()
        .join(lv, Seq("entity"), "left")
        .groupBy(coalesce(col("level"), lit(0)).as("level"))
        .agg(count(lit(1)).as("n_users"))
    },
    Some("""WITH s1 AS (
        SELECT user_id AS entity, min(ts) AS t1
        FROM events WHERE event_type = 'view' GROUP BY 1),
      s2 AS (
        SELECT e.user_id AS entity, min(e.ts) AS t2
        FROM events e JOIN s1 ON s1.entity = e.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY 1),
      s3 AS (
        SELECT e.user_id AS entity, min(e.ts) AS t3
        FROM events e
        JOIN s1 ON s1.entity = e.user_id
        JOIN s2 ON s2.entity = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY 1),
      u AS (SELECT DISTINCT user_id AS entity FROM events),
      lv AS (
        SELECT u.entity,
          CASE WHEN s1.entity IS NULL THEN 0
               WHEN s3.entity IS NOT NULL THEN 3
               WHEN s2.entity IS NOT NULL THEN 2
               ELSE 1 END AS level
        FROM u
        LEFT JOIN s1 USING (entity)
        LEFT JOIN s2 USING (entity)
        LEFT JOIN s3 USING (entity))
      SELECT level, count(*) AS n_users FROM lv GROUP BY 1"""))

  /** Weekly cohort retention matrix — users bucketed by the week of
    * first activity, each cell counting cohort members active at
    * week-offset k (distinct activity days collapse first). Two keyed
    * aggregations + one entity join; no global windows. */
  val q137CohortRetention = Q(
    "q137_cohort_retention",
    (s, d) =>
      graft.operators.Funnel.cohortRetention(events(s, d), "user_id", "ts"),
    Some("""WITH f AS (
        SELECT user_id AS entity, min(CAST(ts AS DATE)) AS cohort_date
        FROM events GROUP BY 1),
      a AS (
        SELECT DISTINCT user_id AS entity, CAST(ts AS DATE) AS d
        FROM events),
      j AS (
        SELECT a.entity,
          CAST(date_trunc('week', f.cohort_date) AS DATE) AS cohort_week,
          CAST(floor((a.d - f.cohort_date) / 7) AS BIGINT) AS week_offset
        FROM a JOIN f USING (entity))
      SELECT cohort_week, week_offset,
        CAST(count(DISTINCT entity) AS BIGINT) AS n_active
      FROM j GROUP BY 1, 2"""))

  /** Per-type OLS trend of daily event volume — closed-form normal
    * equations from five sufficient statistics in ONE aggregation
    * (map-side partials, no per-group sort, no second pass). Integer x
    * (epoch days) and y (daily counts) make every sum exact; the final
    * divisions are the only float ops, so slope/intercept/r2 match
    * cross-engine without tolerance. */
  val q138OlsTrend = Q(
    "q138_ols_trend",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      TimeSeries.olsTrend(daily, Seq("event_type"),
          datediff(col("day"), to_date(lit("1970-01-01"))), col("y"))
        .select(col("event_type"), col("n"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"),
          round(col("r2"), 6).as("r2"))
    },
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
        FROM events GROUP BY 1, 2),
      s AS (
        SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
          sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM (SELECT event_type, (day - DATE '1970-01-01') AS x, y
              FROM daily)
        GROUP BY 1),
      t AS (
        SELECT event_type, n, sx, sy,
          CAST(n * sxy - sx * sy AS DOUBLE) /
            CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
          CAST(n * sxy - sx * sy AS DOUBLE) AS numd,
          CAST(n * sxx - sx * sx AS DOUBLE) AS dxd,
          CAST(n * syy - sy * sy AS DOUBLE) AS dyd
        FROM s)
      SELECT event_type, n, round(slope, 6) AS slope,
        round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
          CAST(n AS DOUBLE), 6) AS intercept,
        round(numd * numd / (dxd * dyd), 6) AS r2
      FROM t"""))

  /** First-order Markov transition matrix over per-user event
    * sequences — P(next | current) from adjacent pairs under one keyed
    * window (total order: ts, event_id). Output is |types|² rows at any
    * stream size; the probability division is the only float op over
    * exact-long operands. */
  val q139MarkovTransitions = Q(
    "q139_markov_transitions",
    (s, d) =>
      graft.operators.Funnel.markovTransitions(events(s, d), "user_id",
          "ts", "event_type", "event_id")
        .select(col("src_type"), col("dst_type"), col("n"),
          round(col("p"), 6).as("p")),
    Some("""WITH seq AS (
        SELECT user_id, event_type,
          lag(event_type) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      pc AS (
        SELECT prev AS src_type, event_type AS dst_type, count(*) AS n
        FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
      tt AS (SELECT src_type, sum(n) AS tot FROM pc GROUP BY 1)
      SELECT pc.src_type, pc.dst_type, pc.n,
        round(CAST(pc.n AS DOUBLE) / CAST(tt.tot AS DOUBLE), 6) AS p
      FROM pc JOIN tt USING (src_type)"""))

  /** MAD-based robust outlier gate (Hampel filter, Iglewicz & Hoaglin
    * 1993) per event type — median and median-absolute-deviation via
    * the proven exact-percentile parity, outliers beyond 3 robust
    * sigmas (MAD x 1.4826). Median-based thresholds don't move when a
    * wild value lands, unlike mean/stddev gates. */
  val q140MadOutliers = Q(
    "q140_mad_outliers",
    (s, d) => {
      val ev = events(s, d)
        .where(col("value").isNotNull && !isnan(col("value")))
      Robust.madStats(ev, Seq("event_type"), col("value"))
        .select(col("event_type"), round(col("med"), 4).as("med"),
          round(col("mad"), 4).as("mad"), col("n"), col("n_outliers"))
    },
    Some("""WITH e AS (
        SELECT event_type, value FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)),
      med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM e GROUP BY 1),
      dev AS (
        SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
        FROM e JOIN med m USING (event_type)),
      mad AS (
        SELECT event_type, quantile_cont(ad, 0.5) AS mad
        FROM dev GROUP BY 1)
      SELECT d.event_type, round(max(d.med), 4) AS med,
        round(max(m.mad), 4) AS mad, count(*) AS n,
        CAST(count(*) FILTER (WHERE d.ad > 3.0 * 1.4826 * m.mad) AS BIGINT)
          AS n_outliers
      FROM dev d JOIN mad m USING (event_type)
      GROUP BY 1"""))

  /** Rolling 7-day z-score anomaly flags on daily event volume —
    * mean/stddev from EXACT integer sums over the frame (no Welford
    * accumulator whose merge order could differ between engines), so
    * z itself hash-matches, not just the flags. Keyed window per
    * event type. */
  val q141RollingZscore = Q(
    "q141_rolling_zscore",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      Windows.rollingZscore(daily, Seq("event_type"), col("day"), col("y"),
          window = 7)
        .select(col("event_type"), col("day"), col("y"), col("n"),
          round(col("z"), 6).as("z"), col("is_anomaly"))
    },
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT event_type, day, y,
          count(*) OVER w AS n, sum(y) OVER w AS sx, sum(y * y) OVER w AS sxx
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      z AS (
        SELECT event_type, day, y, n,
          CASE WHEN n >= 2 AND (n * sxx - sx * sx) > 0 THEN
            (CAST(y AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
              sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
                CAST(n * (n - 1) AS DOUBLE))
          END AS z
        FROM r)
      SELECT event_type, day, y, n, round(z, 6) AS z,
        COALESCE(abs(z) > 2.0, false) AS is_anomaly
      FROM z"""))

  /** Multi-level ROLLUP subtotals (region -> nation -> grand total)
    * with explicit grouping markers — the grouping-sets surface q16's
    * crosstab doesn't exercise: one pass produces every subtotal level,
    * and Spark's partial aggregation handles the level fan-out
    * map-side. Markers are materialized as ints (grouping()) so the
    * NULL-vs-subtotal ambiguity never reaches the compare. */
  val q142RollupSubtotals = Q(
    "q142_rollup_subtotals",
    (s, d) => {
      val joined = customer(s, d)
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
        .join(orders(s, d), col("o_custkey") === col("c_custkey"))
      joined.rollup(col("r_name"), col("n_name"))
        .agg(round(dsum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"),
          grouping(col("r_name")).cast("int").as("g_region"),
          grouping(col("n_name")).cast("int").as("g_nation"))
    },
    Some("""SELECT r_name, n_name,
        round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2)
          AS revenue,
        count(*) AS n_orders,
        CAST(GROUPING(r_name) AS INT) AS g_region,
        CAST(GROUPING(n_name) AS INT) AS g_nation
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN orders ON o_custkey = c_custkey
      GROUP BY ROLLUP (r_name, n_name)"""))

  /** RFM customer segmentation (recency / frequency / monetary) with
    * SCALE-HONEST quartile assignment: instead of a global ntile —
    * which is a single-partition sort of every customer — the three
    * quartile CUT POINTS per metric come from one exact-percentile
    * aggregate (a one-row broadcast), and bucket assignment is
    * map-side comparison (1 + (v>q1) + (v>q2) + (v>q3)). Deterministic
    * at boundaries, identical on both engines, and the only global
    * operation is the 9-value percentile row. */
  val q143RfmSegments = Q(
    "q143_rfm_segments",
    (s, d) => {
      val o = orders(s, d)
      val rfm = o.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          dsum(col("o_totalprice")).as("monetary"))
        .withColumn("__k", Guards.constKey(col("o_custkey")))
      val anchor = o.agg(max(col("o_orderdate")).as("anchor"))
        .withColumn("__k", Guards.constKey(col("anchor")))
      val withR = rfm.join(broadcast(anchor), "__k")
        .withColumn("recency", datediff(col("anchor"), col("last_order")))
      val cuts = withR.agg(
          percentile(col("recency"), array(lit(0.25), lit(0.5), lit(0.75)))
            .as("rc"),
          percentile(col("frequency"), array(lit(0.25), lit(0.5), lit(0.75)))
            .as("fc"),
          percentile(col("monetary"), array(lit(0.25), lit(0.5), lit(0.75)))
            .as("mc"))
        .withColumn("__k", Guards.constKey(col("rc")))
      def bucket(v: Column, cs: Column): Column =
        lit(1) + (v > element_at(cs, 1)).cast("int") +
          (v > element_at(cs, 2)).cast("int") +
          (v > element_at(cs, 3)).cast("int")
      withR.join(broadcast(cuts), "__k")
        .select(
          concat_ws("-",
            bucket(col("recency").cast("double"), col("rc")),
            bucket(col("frequency").cast("double"), col("fc")),
            bucket(col("monetary"), col("mc"))).as("segment"),
          col("monetary"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("monetary").cast("decimal(18,6)")).cast("double"), 2)
            .as("revenue"))
    },
    Some("""WITH rfm AS (
        SELECT o_custkey, max(o_orderdate) AS last_order,
          count(*) AS frequency,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS monetary
        FROM orders GROUP BY 1),
      anc AS (SELECT max(o_orderdate) AS anchor FROM orders),
      wr AS (
        SELECT o_custkey, frequency, monetary,
          (CAST(anchor AS DATE) - CAST(last_order AS DATE)) AS recency
        FROM rfm CROSS JOIN anc),
      cuts AS (
        SELECT quantile_cont(CAST(recency AS DOUBLE), [0.25, 0.5, 0.75]) AS rc,
          quantile_cont(CAST(frequency AS DOUBLE), [0.25, 0.5, 0.75]) AS fc,
          quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mc
        FROM wr),
      seg AS (
        SELECT
          (1 + CAST(CAST(recency AS DOUBLE) > rc[1] AS INT)
             + CAST(CAST(recency AS DOUBLE) > rc[2] AS INT)
             + CAST(CAST(recency AS DOUBLE) > rc[3] AS INT)) || '-' ||
          (1 + CAST(CAST(frequency AS DOUBLE) > fc[1] AS INT)
             + CAST(CAST(frequency AS DOUBLE) > fc[2] AS INT)
             + CAST(CAST(frequency AS DOUBLE) > fc[3] AS INT)) || '-' ||
          (1 + CAST(monetary > mc[1] AS INT)
             + CAST(monetary > mc[2] AS INT)
             + CAST(monetary > mc[3] AS INT)) AS segment,
          monetary
        FROM wr CROSS JOIN cuts)
      SELECT segment, count(*) AS n_customers,
        round(CAST(sum(CAST(monetary AS DECIMAL(18,6))) AS DOUBLE), 2)
          AS revenue
      FROM seg GROUP BY 1"""))

  /** Fuzzy part-name matching (Levenshtein <= 2) — the entity-resolution
    * primitive: token-shared blocking + the length-difference lower
    * bound keep the O(len²) DP off all-pairs; both engines implement
    * classic Levenshtein so the distances themselves hash-match. */
  val q144FuzzyNames = Q(
    "q144_fuzzy_names",
    (s, d) =>
      Joins.fuzzyNameJoin(part(s, d), "p_name", maxDist = 2),
    Some("""WITH n AS (SELECT DISTINCT p_name AS name FROM part
          WHERE p_name IS NOT NULL),
      t AS (SELECT name, unnest(string_split(name, ' ')) AS tok FROM n),
      cand AS (
        SELECT DISTINCT a.name AS name_a, b.name AS name_b
        FROM t a JOIN t b USING (tok)
        WHERE a.name < b.name
          AND abs(length(a.name) - length(b.name)) <= 2)
      SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS INT) AS dist
      FROM cand WHERE levenshtein(name_a, name_b) <= 2"""))

  /** Daily active users + cumulative distinct users — the growth-curve
    * pair. The cumulative count NEVER re-scans history: each user
    * collapses to a first-activity day (one keyed aggregation), daily
    * new-user counts ride the bounded day series, and the running total
    * is a guarded single-partition window over ~days rows. */
  val q145CumulativeUniques = Q(
    "q145_cumulative_uniques",
    (s, d) => {
      val ev = events(s, d)
      val dau = ev.select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val firstDay = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      val joined = dau.join(firstDay, Seq("day"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      val w = Window.partitionBy(Guards.constKey(col("day")))
        .orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joined.withColumn("cum_users",
        Guards.bounded(sum(col("n_new")).over(w), col("day"),
          "cumulative uniques day series"))
    },
    Some("""WITH dau AS (
        SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau
        FROM events GROUP BY 1),
      fd AS (
        SELECT min(CAST(ts AS DATE)) AS day, user_id
        FROM events GROUP BY user_id),
      nn AS (SELECT day, count(*) AS n_new FROM fd GROUP BY 1)
      SELECT dau.day, dau.dau, COALESCE(nn.n_new, 0) AS n_new,
        CAST(sum(COALESCE(nn.n_new, 0)) OVER (
          ORDER BY dau.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS BIGINT) AS cum_users
      FROM dau LEFT JOIN nn USING (day)"""))

  /** Market-basket co-occurrence with lift (Agrawal et al. 1993's
    * level-2 pass) — frequent part PAIRS across orders. The pair
    * generator is a self-join WITHIN the order key, so fan-out is
    * bounded by basket size squared (TPC-H baskets are <= 7 lines) at
    * any order count; supports and lift come from exact counts with
    * one fixed-order double division. Top 20 by co-occurrence count
    * with a full tie-break. */
  val q146BasketPairs = Q(
    "q146_basket_pairs",
    (s, d) => {
      val items = lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct().localCheckpoint(true)
      val pairs = items.select(col("o"), col("p").as("pa"))
        .join(items.select(col("o"), col("p").as("pb")), Seq("o"))
        .where(col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_ab"))
      val supp = items.groupBy(col("p")).agg(count(lit(1)).as("n"))
      val totals = items.agg(countDistinct(col("o")).as("n_orders"))
        .withColumn("__k", Guards.constKey(col("n_orders")))
      pairs
        .join(broadcast(supp.select(col("p").as("pa"), col("n").as("n_a"))),
          Seq("pa"))
        .join(broadcast(supp.select(col("p").as("pb"), col("n").as("n_b"))),
          Seq("pb"))
        .withColumn("__k", Guards.constKey(col("pa")))
        .join(broadcast(totals), "__k")
        .select(col("pa"), col("pb"), col("n_ab"),
          round(col("n_ab").cast("double") / col("n_orders").cast("double"),
            6).as("support"),
          round(col("n_ab").cast("double") * col("n_orders").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")), 6)
            .as("lift"))
        .orderBy(col("n_ab").desc, col("pa"), col("pb")).limit(20)
    },
    Some("""WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      pairs AS (
        SELECT a.p AS pa, b.p AS pb, count(*) AS n_ab
        FROM items a JOIN items b USING (o)
        WHERE a.p < b.p GROUP BY 1, 2),
      supp AS (SELECT p, count(*) AS n FROM items GROUP BY 1),
      tot AS (SELECT count(DISTINCT o) AS n_orders FROM items)
      SELECT pa, pb, n_ab,
        round(CAST(n_ab AS DOUBLE) / CAST(n_orders AS DOUBLE), 6) AS support,
        round(CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE) /
          (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)), 6) AS lift
      FROM pairs
      JOIN supp sa ON sa.p = pa
      JOIN supp sb ON sb.p = pb
      CROSS JOIN tot
      ORDER BY n_ab DESC, pa, pb LIMIT 20"""))

  /** Random-projection ANN (Johnson-Lindenstrauss; Vempala 2004) —
    * candidates ranked by cosine in an 8-dim projection (8 multiplies
    * per pair instead of 64) using the hyperplane sketch's
    * deterministic md5 plane weights, top-30 per probe reranked with
    * the exact 64-dim cosine. Every projection and dot product is an
    * index-ordered sequential fold, replayed in the oracle with
    * list_reduce over a prepended double zero — so the candidate SET
    * and the final ranking are bit-deterministic, completing the ANN
    * family: brute, LSH buckets, IVF, multi-probe, PQ/ADC, IVF-PQ,
    * and now the projected-rerank path. */
  val q147RpAnn = Q(
    "q147_rp_ann",
    (s, d) => {
      val emb = embeddings(s, d)
      Similarity.rpTopK(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", "vec_id", dims = 64, rDims = 8,
        cand = 30, k = 5)
    },
    Some("""WITH P AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      proj AS (
        SELECT vec_id, v,
          list_transform(range(8), p ->
            list_reduce(
              list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(range(64), i ->
                  v[i + 1] * (('0x' || substr(md5(p || '_' || i), 1, 8))::BIGINT
                    / 4294967296.0 - 0.5))),
              (a, b) -> a + b)) AS pp
        FROM P),
      pr AS (SELECT vec_id AS probe_id, pp AS qp, v AS qv
             FROM proj WHERE vec_id < 10),
      sc AS (
        SELECT c.vec_id AS neighbor_id, pr.probe_id, c.v AS cv, pr.qv,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(8), j -> c.pp[j + 1] * pr.qp[j + 1])),
            (a, b) -> a + b) AS pd,
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(8), j -> c.pp[j + 1] * c.pp[j + 1])),
            (a, b) -> a + b)) *
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(8), j -> pr.qp[j + 1] * pr.qp[j + 1])),
            (a, b) -> a + b)) AS pn
        FROM proj c CROSS JOIN pr
        WHERE c.vec_id <> pr.probe_id),
      ranked AS (
        SELECT *, CASE WHEN pn > 0 THEN pd / pn END AS pcos
        FROM sc),
      cand AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (
            PARTITION BY probe_id ORDER BY pcos DESC, neighbor_id) AS cr
          FROM ranked)
        WHERE cr <= 30),
      exact AS (
        SELECT probe_id, neighbor_id,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(64), i -> cv[i + 1] * qv[i + 1])),
            (a, b) -> a + b) AS d,
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(64), i -> cv[i + 1] * cv[i + 1])),
            (a, b) -> a + b)) *
          sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(64), i -> qv[i + 1] * qv[i + 1])),
            (a, b) -> a + b)) AS nn
        FROM cand)
      SELECT probe_id, rank, neighbor_id, cos FROM (
        SELECT probe_id, neighbor_id,
          row_number() OVER (PARTITION BY probe_id
            ORDER BY (CASE WHEN nn > 0 THEN d / nn END) DESC, neighbor_id)
            AS rank,
          round(CASE WHEN nn > 0 THEN d / nn END, 6) AS cos
        FROM exact)
      WHERE rank <= 5"""))

  /** DAU / trailing-7-day WAU stickiness per day. The WAU is computed
    * WITHOUT a range join or per-day rescans: each distinct (user, day)
    * activity explodes to the 7 window days it supports (a fixed x7
    * map-side fan-out), then one distinct-count per day — everything
    * equi-keyed, no BroadcastNestedLoop. */
  val q148Stickiness = Q(
    "q148_stickiness",
    (s, d) => {
      val ev = events(s, d)
      val userDays = ev
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .localCheckpoint(true)
      val dau = userDays.groupBy(col("day"))
        .agg(count(lit(1)).as("dau"))
      val wau = userDays
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("i")).as("day"))
        .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
    },
    Some("""WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
      wau AS (
        SELECT day + CAST(unnest(range(0, 7)) AS INT) AS day,
          user_id
        FROM ud),
      wauc AS (
        SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM wau GROUP BY 1)
      SELECT dau.day, dau.dau, wauc.wau,
        round(CAST(dau.dau AS DOUBLE) / CAST(wauc.wau AS DOUBLE), 6)
          AS stickiness
      FROM dau JOIN wauc USING (day)"""))

  /** Last-touch purchase attribution via the as-of join — each purchase
    * credited to the user's most recent click, attributed only when the
    * click falls inside a 3-day lookback. The as-of carry is the
    * union-window operator (one keyed shuffle, no per-purchase
    * subquery); the latency average divides EXACT microsecond sums, so
    * it hash-matches without tolerance. */
  val q149Attribution = Q(
    "q149_attribution",
    (s, d) => {
      val ev = events(s, d)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").cast("timestamp").as("pts"),
          col("event_id"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").cast("timestamp").as("cts"))
      val joined = Joins.asOfJoinBackward(purchases, clicks, Seq("user_id"),
        "pts", "cts", Seq("cts"))
      val att = joined.withColumn("attributed",
          col("cts").isNotNull &&
            col("cts") >= col("pts") - expr("INTERVAL 3 DAY"))
        .withColumn("lat_us", when(col("attributed"),
          unix_micros(col("pts")) - unix_micros(col("cts"))))
      att.groupBy(col("attributed"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("lat_us")).cast("double") /
            count(col("lat_us")).cast("double") / lit(1000000.0), 3)
            .as("avg_latency_sec"))
    },
    Some("""WITH p AS (
        SELECT user_id, ts AS pts, event_id FROM events
        WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts AS cts FROM events
        WHERE event_type = 'click'),
      j AS (
        SELECT p.user_id, p.pts,
          (SELECT max(c.cts) FROM c
           WHERE c.user_id = p.user_id AND c.cts <= p.pts) AS cts
        FROM p),
      a AS (
        SELECT *,
          cts IS NOT NULL AND cts >= pts - INTERVAL 3 DAY AS attributed,
          CASE WHEN cts IS NOT NULL AND cts >= pts - INTERVAL 3 DAY
            THEN epoch_us(pts) - epoch_us(cts) END AS lat_us
        FROM j)
      SELECT attributed, count(*) AS n_purchases,
        round(CAST(sum(lat_us) AS DOUBLE) / CAST(count(lat_us) AS DOUBLE)
          / 1000000.0, 3) AS avg_latency_sec
      FROM a GROUP BY 1"""))

  /** Inter-event gap histogram (minute buckets, capped at 60) — the
    * arrival-process profile behind sessionization gap choices. One
    * keyed lag window (total order ts, event_id), integer microsecond
    * differences, integer `div` bucketing — no float path at all. */
  val q150GapHistogram = Q(
    "q150_gap_histogram",
    (s, d) => {
      val ev = events(s, d)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("timestamp"), col("event_id"))
      ev.withColumn("__gap_us",
          unix_micros(col("ts").cast("timestamp")) -
            lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
        .where(col("__gap_us").isNotNull)
        .select(least(expr("__gap_us div 60000000"), lit(60L))
          .as("bucket_min"))
        .groupBy(col("bucket_min")).agg(count(lit(1)).as("n"))
    },
    Some("""WITH g AS (
        SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events)
      SELECT least(gap_us // 60000000, 60) AS bucket_min, count(*) AS n
      FROM g WHERE gap_us IS NOT NULL GROUP BY 1"""))

  /** Column profiling of lineitem — the ingest-time data-quality audit:
    * every statistic for every column in ONE scan (a single aggregation
    * row, map-side partials, unpivoted with stack). Numeric min/max
    * stay typed doubles; dates/strings surface as ISO strings, so the
    * engines cannot disagree on float formatting. */
  val q151ProfileAudit = Q(
    "q151_profile_audit",
    (s, d) =>
      Profiler.profile(lineitem(s, d),
        Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
          "l_discount", "l_returnflag", "l_shipdate")),
    Some(Seq(
      ("l_orderkey", true), ("l_partkey", true), ("l_quantity", true),
      ("l_extendedprice", true), ("l_discount", true),
      ("l_returnflag", false), ("l_shipdate", false)).map { case (c, num) =>
      val minN = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val maxN = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val minS = if (num) "CAST(NULL AS VARCHAR)" else s"CAST(min($c) AS VARCHAR)"
      val maxS = if (num) "CAST(NULL AS VARCHAR)" else s"CAST(max($c) AS VARCHAR)"
      s"""SELECT '$c' AS col_name, count($c) AS n_nonnull,
        count(*) - count($c) AS n_null,
        CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
        $minN AS min_num, $maxN AS max_num,
        $minS AS min_txt, $maxS AS max_txt
      FROM lineitem"""
    }.mkString(" UNION ALL ")))

  /** SCD type-2 dimension build from a change stream — collapse each
    * user's event-type runs into validity intervals [valid_from,
    * valid_to) with an open current row. Two keyed windows (lag to
    * detect changes, lead to close intervals) over the entity key; the
    * run-collapse never compares more than adjacent rows, so state is
    * O(1) per row at any stream length. */
  val q152Scd2Intervals = Q(
    "q152_scd2_intervals",
    (s, d) => {
      val ev = events(s, d)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("timestamp"), col("event_id"))
      val changes = ev
        .withColumn("__prev", lag(col("event_type"), 1).over(w))
        .where(col("__prev").isNull || col("__prev") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("timestamp"), col("event_id"))
      changes
        .withColumn("valid_to", lead(col("ts").cast("timestamp"), 1).over(w2))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").cast("timestamp").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .groupBy(col("state"), col("is_current"))
        .agg(count(lit(1)).as("n_intervals"),
          round(sum(when(col("valid_to").isNotNull,
              unix_micros(col("valid_to")) - unix_micros(col("valid_from"))))
            .cast("double") /
            count(when(col("valid_to").isNotNull, 1)).cast("double") /
            lit(1000000.0), 3).as("avg_duration_sec"))
    },
    Some("""WITH ch AS (
        SELECT user_id, event_type AS state, ts, event_id,
          lag(event_type) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      runs AS (
        SELECT user_id, state, ts AS valid_from,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS valid_to
        FROM ch WHERE prev IS NULL OR prev <> state)
      SELECT state, valid_to IS NULL AS is_current,
        count(*) AS n_intervals,
        round(CAST(sum(CASE WHEN valid_to IS NOT NULL
            THEN epoch_us(valid_to) - epoch_us(valid_from) END) AS DOUBLE) /
          CAST(count(CASE WHEN valid_to IS NOT NULL THEN 1 END) AS DOUBLE) /
          1000000.0, 3) AS avg_duration_sec
      FROM runs GROUP BY 1, 2"""))

  /** Month-over-month revenue deltas with percent change — the classic
    * period-comparison report: one keyed lag window over the bounded
    * month series per flag; the delta is an exact decimal difference
    * and only the pct ratio touches floats (fixed-order division). */
  val q153MomDeltas = Q(
    "q153_mom_deltas",
    (s, d) => {
      val monthly = lineitem(s, d)
        .groupBy(col("l_returnflag"),
          date_trunc("MONTH", col("l_shipdate")).as("month"))
        .agg(sum(revDec).as("rev"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("month"))
      monthly
        .withColumn("__prev", lag(col("rev"), 1).over(w))
        .select(col("l_returnflag"), col("month"),
          round(col("rev"), 2).cast("double").as("revenue"),
          round(col("rev") - col("__prev"), 2).cast("double").as("mom_delta"),
          round((col("rev") - col("__prev")).cast("double") /
            col("__prev").cast("double") * lit(100.0), 4).as("mom_pct"))
    },
    Some("""WITH m AS (
        SELECT l_returnflag, date_trunc('month', l_shipdate) AS month,
          sum(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS rev
        FROM lineitem GROUP BY 1, 2),
      r AS (
        SELECT l_returnflag, month, rev,
          lag(rev) OVER (PARTITION BY l_returnflag ORDER BY month) AS prev
        FROM m)
      SELECT l_returnflag, month,
        CAST(round(rev, 2) AS DOUBLE) AS revenue,
        CAST(round(rev - prev, 2) AS DOUBLE) AS mom_delta,
        round(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE) * 100.0, 4)
          AS mom_pct
      FROM r"""))

  /** A/B two-proportion z-test on purchase conversion between the
    * hash-split cohorts — the experiment-readout primitive. Counts are
    * exact; the z statistic is a fixed-order chain of IEEE ops over
    * them (pooled proportion, standard error, difference), so the
    * statistic itself hash-matches. Significance is |z| against the
    * two-sided 5% critical value as a literal both engines parse
    * identically. */
  val q154AbTest = Q(
    "q154_ab_test",
    (s, d) => {
      val ev = events(s, d)
      // experiment unit = user-day (per-user conversion saturates at
      // ~100% over a 30-day window, degenerating the test)
      val cohort = ev
        .withColumn("grp",
          when(Curation.hashSplit(col("user_id")) === "train", "A")
            .otherwise("B"))
        .groupBy(col("grp"), col("user_id"), to_date(col("ts")).as("day"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("converted"))
      val stats = cohort.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
      val a = stats.where(col("grp") === "A")
        .select(col("n").as("n_a"), col("conv").as("conv_a"))
        .withColumn("__k", Guards.constKey(col("n_a")))
      val b = stats.where(col("grp") === "B")
        .select(col("n").as("n_b"), col("conv").as("conv_b"))
        .withColumn("__k", Guards.constKey(col("n_b")))
      val j = a.join(b, "__k")
      val pa = col("conv_a").cast("double") / col("n_a").cast("double")
      val pb = col("conv_b").cast("double") / col("n_b").cast("double")
      val pp = (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double")
      val se = sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a").cast("double") +
          lit(1.0) / col("n_b").cast("double")))
      // degenerate experiment (0% or 100% pooled conversion) has no
      // defined z; also keeps ANSI division-by-zero out of the plan
      val z = when(se > 0, (pa - pb) / se)
      j.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
        round(z, 4).as("z"),
        coalesce(abs(z) > lit(1.959963985), lit(false))
          .as("significant_5pct"))
    },
    Some("""WITH cohort AS (
        SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
            % 100 < 80 THEN 'A' ELSE 'B' END AS grp,
          user_id, CAST(ts AS DATE) AS day,
          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS converted
        FROM events GROUP BY 1, 2, 3),
      stats AS (
        SELECT grp, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
        FROM cohort GROUP BY 1),
      j AS (
        SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b
        FROM (SELECT * FROM stats WHERE grp = 'A') a
        CROSS JOIN (SELECT * FROM stats WHERE grp = 'B') b),
      c AS (
        SELECT *,
          CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
          CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
          CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp
        FROM j),
      zc AS (
        SELECT *,
          CASE WHEN sqrt(pp * (1.0 - pp) *
              (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) > 0
            THEN (pa - pb) / sqrt(pp * (1.0 - pp) *
              (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
          END AS z
        FROM c)
      SELECT n_a, conv_a, n_b, conv_b,
        round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
        round(z, 4) AS z,
        COALESCE(abs(z) > 1.959963985, false) AS significant_5pct
      FROM zc"""))

  /** Chi-square test of independence between event type and cohort —
    * observed vs expected cell counts from exact totals (expected =
    * row_total * col_total / grand_total in a fixed operation order),
    * the statistic summed as 9-dp decimals so cell order cannot change
    * the result. Output: statistic, degrees of freedom, and the
    * 5%-critical comparison for that dof. */
  val q155ChiSquare = Q(
    "q155_chi_square",
    (s, d) => {
      val ev = events(s, d)
        .withColumn("grp",
          when(Curation.hashSplit(col("user_id")) === "train", "A")
            .otherwise("B"))
      val cells = ev.groupBy(col("grp"), col("event_type"))
        .agg(count(lit(1)).as("o"))
      val rowT = cells.groupBy(col("grp")).agg(sum(col("o")).as("rt"))
      val colT = cells.groupBy(col("event_type")).agg(sum(col("o")).as("ct"))
      val grand = cells.agg(sum(col("o")).as("gt"))
        .withColumn("__k", Guards.constKey(col("gt")))
      val terms = cells
        .join(broadcast(rowT), Seq("grp"))
        .join(broadcast(colT), Seq("event_type"))
        .withColumn("__k", Guards.constKey(col("grp")))
        .join(broadcast(grand), "__k")
        .withColumn("e", col("rt").cast("double") * col("ct").cast("double") /
          col("gt").cast("double"))
        .withColumn("t", round((col("o").cast("double") - col("e")) *
          (col("o").cast("double") - col("e")) / col("e"), 9)
          .cast("decimal(28,9)"))
      terms.agg(
          sum(col("t")).cast("double").as("chi2_raw"),
          countDistinct(col("grp")).as("r"),
          countDistinct(col("event_type")).as("c"))
        .select(round(col("chi2_raw"), 6).as("chi2"),
          ((col("r") - 1) * (col("c") - 1)).as("dof"),
          // two cohorts x five event types -> dof 4; 5% critical 9.4877
          (col("chi2_raw") > lit(9.487729037)).as("significant_5pct_dof4"))
    },
    Some("""WITH ev AS (
        SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
            % 100 < 80 THEN 'A' ELSE 'B' END AS grp,
          event_type
        FROM events),
      cells AS (
        SELECT grp, event_type, count(*) AS o FROM ev GROUP BY 1, 2),
      rt AS (SELECT grp, sum(o) AS rt FROM cells GROUP BY 1),
      ct AS (SELECT event_type, sum(o) AS ct FROM cells GROUP BY 1),
      gt AS (SELECT sum(o) AS gt FROM cells),
      terms AS (
        SELECT CAST(round(
            (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e, 9)
            AS DECIMAL(28,9)) AS t
        FROM (
          SELECT cells.o,
            CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
              / CAST(gt.gt AS DOUBLE) AS e
          FROM cells
          JOIN rt USING (grp)
          JOIN ct USING (event_type)
          CROSS JOIN gt)),
      agg AS (
        SELECT CAST(sum(t) AS DOUBLE) AS chi2_raw,
          (SELECT count(DISTINCT grp) FROM cells) AS r,
          (SELECT count(DISTINCT event_type) FROM cells) AS c
        FROM terms)
      SELECT round(chi2_raw, 6) AS chi2,
        CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
        chi2_raw > 9.487729037 AS significant_5pct_dof4
      FROM agg"""))

  /** Maximal duplicated-substring spans (Lee et al. 2022 ExactSubstr,
    * k-gram-island distributed form — see Corpus.duplicateSpans): per
    * document, every maximal run of >= 8 consecutive tokens that appears
    * verbatim in at least one other document, merged to spans and
    * reported as a duplicated-token budget. The island merge is the
    * part q105's non-overlapping spans cannot see: two documents sharing
    * a 40-token paragraph at different offsets report exactly one
    * 40-token span here, regardless of alignment. */
  val q156DupSpans = Q(
    "q156_dup_spans",
    (s, d) =>
      graft.operators.Corpus.duplicateSpans(documents(s, d), "doc_id",
        "text", k = 8),
    Some(s"""WITH t AS ($duckToksSql),
      c AS (
        SELECT doc_id, len(toks) AS n_tokens, toks,
          unnest(range(0, len(toks) - 7)) AS start
        FROM t WHERE len(toks) >= 8),
      s AS (
        SELECT doc_id, n_tokens, start,
          ('0x' || substr(md5('0:' ||
            array_to_string(toks[start + 1 : start + 8], ' ')), 1, 15))::BIGINT AS key
        FROM c),
      dk AS (
        SELECT key FROM (SELECT DISTINCT key, doc_id FROM s)
        GROUP BY key HAVING count(*) >= 2),
      d AS (
        SELECT doc_id, n_tokens, start,
          start - row_number() OVER (PARTITION BY doc_id ORDER BY start) AS isl
        FROM s JOIN dk USING (key)),
      sp AS (
        SELECT doc_id, min(n_tokens) AS n_tokens,
          min(start) AS s0, max(start) AS e0
        FROM d GROUP BY doc_id, isl)
      SELECT doc_id, count(*) AS n_spans,
        CAST(sum(e0 - s0 + 8) AS BIGINT) AS dup_tokens,
        CAST(min(n_tokens) AS BIGINT) AS n_tokens,
        round(CAST(sum(e0 - s0 + 8) AS DOUBLE) / min(n_tokens), 6) AS dup_ratio
      FROM sp GROUP BY doc_id"""))

  /** Jensen-Shannon divergence of each language slice's unigram
    * distribution vs the whole corpus (Curation.jsDivergence) — the
    * slice-drift readout a mixture designer reads before setting q94's
    * temperature weights. The out-of-slice tail is folded to
    * 0.5·(1 − Σ Q) so no slice×vocab cross join exists in either
    * engine's plan. */
  val q157JsDivergence = Q(
    "q157_js_divergence",
    (s, d) =>
      graft.operators.Curation.jsDivergence(documents(s, d), "lang", "text"),
    Some("""WITH t AS (
        SELECT lang,
          CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
               THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
          END AS toks
        FROM documents),
      w AS (SELECT lang AS slice, unnest(toks) AS tok FROM t),
      sc AS (SELECT slice, tok, count(*) AS cs FROM w GROUP BY 1, 2),
      cc AS (SELECT tok, count(*) AS cc FROM w GROUP BY 1),
      st AS (SELECT slice, sum(cs) AS ts, count(*) AS n_types
             FROM sc GROUP BY 1),
      ct AS (SELECT sum(cc) AS tc FROM cc),
      j AS (
        SELECT slice, ts, n_types,
          CAST(round(0.5 * p * log2(2 * p / (p + q)) +
                     0.5 * q * log2(2 * q / (p + q)), 12) AS DECIMAL(28,12)) AS t12,
          CAST(round(q, 12) AS DECIMAL(28,12)) AS q12
        FROM (
          SELECT sc.slice, st.ts, st.n_types,
            CAST(sc.cs AS DOUBLE) / st.ts AS p,
            CAST(cc.cc AS DOUBLE) / ct.tc AS q
          FROM sc JOIN cc USING (tok) JOIN st USING (slice) CROSS JOIN ct))
      SELECT slice AS lang, CAST(min(ts) AS BIGINT) AS n_tokens,
        CAST(min(n_types) AS BIGINT) AS n_types,
        round(CAST(sum(t12) AS DOUBLE) +
              0.5 * (1.0 - CAST(sum(q12) AS DOUBLE)), 6) AS jsd
      FROM j GROUP BY 1"""))

  /** HLL set-overlap audit (Sketches.overlapEstimate): pairwise distinct
    * part overlap between ship years by sketch-union inclusion-exclusion.
    * Like q53, sketch binaries are engine-specific, so the oracle checks
    * the exact pairwise counts plus driver-checkable bounds booleans: the
    * per-set estimates within 3·RSE (lgK=12 → 5%), the intersection
    * within the compounded inclusion-exclusion bound (3 estimates sum
    * their absolute errors). */
  val q158HllOverlap = Q(
    "q158_hll_overlap",
    (s, d) => {
      val base = lineitem(s, d)
        .select(year(col("l_shipdate")).as("y"), col("l_partkey").as("pk"))
      val est = graft.operators.Sketches.overlapEstimate(
        base, col("y"), col("pk"))
      val dset = base.distinct()
      val exact = dset.groupBy("y").agg(count(lit(1)).as("c"))
      val inter = dset.as("x")
        .join(dset.as("z"),
          col("x.pk") === col("z.pk") && col("x.y") < col("z.y"))
        .groupBy(col("x.y").as("set_a"), col("z.y").as("set_b"))
        .agg(count(lit(1)).as("exact_intersection"))
      est
        .join(broadcast(exact.select(col("y").as("set_a"), col("c").as("exact_a"))),
          Seq("set_a"))
        .join(broadcast(exact.select(col("y").as("set_b"), col("c").as("exact_b"))),
          Seq("set_b"))
        .join(broadcast(inter), Seq("set_a", "set_b"), "left")
        .withColumn("exact_intersection",
          coalesce(col("exact_intersection"), lit(0L)))
        .withColumn("exact_union",
          col("exact_a") + col("exact_b") - col("exact_intersection"))
        .select(col("set_a"), col("set_b"),
          col("exact_a"), col("exact_b"), col("exact_intersection"),
          (abs(col("est_a") - col("exact_a")) / col("exact_a") <= 0.05)
            .as("a_within_3rse"),
          (abs(col("est_b") - col("exact_b")) / col("exact_b") <= 0.05)
            .as("b_within_3rse"),
          (abs(col("est_intersection") - col("exact_intersection")) <=
            lit(0.05) * (col("exact_a") + col("exact_b") + col("exact_union")))
            .as("intersection_within_ie_bound"))
    },
    Some("""WITH d AS (
        SELECT DISTINCT CAST(year(l_shipdate) AS INT) AS y, l_partkey AS pk
        FROM lineitem),
      n AS (SELECT y, count(*) AS c FROM d GROUP BY 1),
      i AS (
        SELECT x.y AS set_a, z.y AS set_b, count(*) AS exact_intersection
        FROM d x JOIN d z ON x.pk = z.pk AND x.y < z.y GROUP BY 1, 2),
      p AS (
        SELECT a.y AS set_a, b.y AS set_b, a.c AS exact_a, b.c AS exact_b
        FROM n a JOIN n b ON a.y < b.y)
      SELECT p.set_a, p.set_b, p.exact_a, p.exact_b,
        CAST(coalesce(i.exact_intersection, 0) AS BIGINT) AS exact_intersection,
        true AS a_within_3rse, true AS b_within_3rse,
        true AS intersection_within_ie_bound
      FROM p LEFT JOIN i USING (set_a, set_b)"""))

  /** Z-order layout audit (Layout.zorderKey): cluster lineitem on the
    * Morton interleave of (partkey, suppkey) buckets and measure what a
    * 2-D box predicate would scan under 16×16 z-tiles — the file/
    * partition-pruning arithmetic of a z-clustered 100 TB table, as an
    * exact relational readout both engines agree on bit-for-bit. */
  val q159ZorderLayout = Q(
    "q159_zorder_layout",
    (s, d) => {
      import graft.operators.Layout
      val x = pmod(col("l_partkey"), lit(256)).cast("int")
      val y = pmod(col("l_suppkey"), lit(256)).cast("int")
      val tiled = lineitem(s, d)
        .select(x.as("x"), y.as("y"))
        .withColumn("zb",
          Layout.zTile(Layout.zorderKey(col("x"), col("y"), 8), 4))
      val inBox = col("x").between(40, 55) && col("y").between(100, 115)
      tiled.groupBy("zb")
        .agg(count(lit(1)).as("tile_rows"),
          count(when(inBox, 1)).as("box_rows"))
        .agg(count(lit(1)).as("n_tiles"),
          sum(when(col("box_rows") > 0, 1L).otherwise(0L)).as("tiles_touched"),
          sum("box_rows").as("rows_in_box"),
          sum(when(col("box_rows") > 0, col("tile_rows")).otherwise(0L))
            .as("rows_scanned"),
          sum("tile_rows").as("rows_total"))
        .select(col("n_tiles"), col("tiles_touched"), col("rows_in_box"),
          col("rows_scanned"), col("rows_total"),
          round(col("rows_scanned").cast("double") / col("rows_total"), 6)
            .as("scan_fraction"))
    },
    Some {
      val zExpr = (0 until 8).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) | (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH b AS (
        SELECT CAST(l_partkey % 256 AS INT) AS x,
               CAST(l_suppkey % 256 AS INT) AS y
        FROM lineitem),
      t AS (
        SELECT ($zExpr) >> 8 AS zb,
          count(*) AS tile_rows,
          count(*) FILTER (WHERE x BETWEEN 40 AND 55
                             AND y BETWEEN 100 AND 115) AS box_rows
        FROM b GROUP BY 1)
      SELECT CAST(count(*) AS BIGINT) AS n_tiles,
        CAST(count(*) FILTER (WHERE box_rows > 0) AS BIGINT) AS tiles_touched,
        CAST(sum(box_rows) AS BIGINT) AS rows_in_box,
        CAST(sum(CASE WHEN box_rows > 0 THEN tile_rows ELSE 0 END) AS BIGINT)
          AS rows_scanned,
        CAST(sum(tile_rows) AS BIGINT) AS rows_total,
        round(CAST(sum(CASE WHEN box_rows > 0 THEN tile_rows ELSE 0 END)
          AS DOUBLE) / sum(tile_rows), 6) AS scan_fraction
      FROM t"""
    })

  /** The q160 tokenizer artifact: an ordered BPE merge table (what
    * Bpe.train emits, shipped as config — the inference-side contract of
    * every BPE tokenizer). */
  private val bpeMerges: Seq[(String, String)] = Seq(
    "e" -> "</w>", "s" -> "</w>", "d" -> "</w>", "t" -> "h",
    "th" -> "e</w>", "i" -> "n", "a" -> "n", "o" -> "u", "r" -> "e",
    "an" -> "d</w>")

  /** BPE encode (Bpe.encode) — the tokenizer's inference half: apply the
    * ordered merge table to every document and report the subword
    * budget. The distinct-word table is encoded ONCE map-side (chained
    * literal replaces over delimiter-framed symbols — greedy
    * left-to-right non-overlapping merge semantics in both engines) and
    * joined back to the corpus on the word key. */
  val q160BpeEncode = Q(
    "q160_bpe_encode",
    (s, d) =>
      graft.operators.Bpe.encode(documents(s, d), "doc_id", "text",
        bpeMerges),
    Some {
      def q(sym: String) = s"'$sym'"
      val enc0 = "chr(31) || array_to_string(list_concat(" +
        "list_transform(range(1, length(word) + 1), i -> substr(word, i, 1))," +
        " ['</w>']), chr(30) || chr(31)) || chr(30)"
      val encChain = bpeMerges.foldLeft(enc0) { case (e, (a, b)) =>
        s"replace($e, chr(31) || ${q(a)} || chr(30) || chr(31) || ${q(b)} || chr(30), " +
          s"chr(31) || ${q(a + b)} || chr(30))"
      }
      s"""WITH t AS ($duckToksSql),
      w AS (
        SELECT doc_id, unnest(toks) AS word FROM t),
      w2 AS (SELECT doc_id, word FROM w WHERE word <> ''),
      v0 AS (SELECT DISTINCT word FROM w2),
      ve AS (SELECT word, $encChain AS e FROM v0),
      v AS (SELECT word,
              length(e) - length(replace(e, chr(31), '')) AS n_sub
            FROM ve)
      SELECT doc_id, count(*) AS n_words,
        CAST(sum(n_sub) AS BIGINT) AS n_subwords,
        round(CAST(sum(n_sub) AS DOUBLE) / count(*), 6) AS subwords_per_word
      FROM w2 JOIN v USING (word) GROUP BY 1"""
    })

  /** Hybrid retrieval by reciprocal-rank fusion (Similarity.rrfFuse):
    * BM25 keyword top-100 ⊕ embedding-cosine top-100 for one probe,
    * fused as Σ 1/(60+rank) — the calibration-free hybrid-search
    * combiner. Both lists are truncated BEFORE ranking (TakeOrdered →
    * bounded constKey window / brute-force top-k), so the fusion joins
    * run over ≤100-row frames at any corpus size. */
  val q161HybridRrf = {
    val terms = Seq("table", "stream", "key", "scan")
    Q(
      "q161_hybrid_rrf",
      (s, d) => {
        val bm = graft.operators.Curation.bm25(documents(s, d), "doc_id",
          "text", terms, k1 = 1.2, b = 0.75)
        val textTop = bm.orderBy(col("bm25").desc, col("doc_id")).limit(100)
        val wT = Window
          .partitionBy(graft.operators.Guards.constKey(col("doc_id")))
          .orderBy(col("bm25").desc, col("doc_id"))
        val textRank = textTop.withColumn("rank", row_number().over(wT))
          .select(col("doc_id"), col("rank"))
        val emb = embeddings(s, d)
        val vecRank = Similarity.bruteForceTopK(emb,
            emb.where(col("vec_id") === 0),
            "vec_id", "embedding", "vec_id", k = 100)
          .select(col("neighbor_id").as("doc_id"), col("rank"))
        // one full-outer fuse carrying both ranks — joining the rank
        // lists back onto rrfFuse's output would re-run both retrieval
        // arms once per decoration (3x the bm25/brute-force work)
        textRank.withColumnRenamed("rank", "text_rank")
          .join(vecRank.withColumnRenamed("rank", "vec_rank"),
            Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("text_rank"), col("vec_rank"),
            round(
              coalesce(lit(1.0) / (lit(60) + col("text_rank")), lit(0.0)) +
                coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)),
              9).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id")).limit(20)
      },
      Some(s"""WITH t AS ($duckToksSql),
        base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM t),
        totals AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM base),
        tf AS (
          SELECT doc_id, dl, tok, count(*) AS tf
          FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM base)
          WHERE tok IN ('table', 'stream', 'key', 'scan')
          GROUP BY 1, 2, 3),
        dft AS (SELECT tok, count(*) AS df_t FROM tf GROUP BY 1),
        c AS (
          SELECT tf.doc_id,
            CAST(round(
              ln(1.0 + (totals.n_docs - dft.df_t + 0.5) / (dft.df_t + 0.5))
                * (tf.tf * 2.2)
                / (tf.tf + 1.2 * (1.0 - 0.75
                    + 0.75 * tf.dl / (CAST(totals.sum_dl AS DOUBLE) / totals.n_docs))),
              9) AS DECIMAL(28,9)) AS contrib
          FROM tf JOIN dft ON tf.tok = dft.tok CROSS JOIN totals),
        bm AS (
          SELECT doc_id, round(CAST(sum(contrib) AS DOUBLE), 6) AS bm25
          FROM c GROUP BY 1),
        tr AS (
          SELECT doc_id, trank FROM (
            SELECT doc_id,
              row_number() OVER (ORDER BY bm25 DESC, doc_id) AS trank
            FROM bm) WHERE trank <= 100),
        vr AS (
          SELECT doc_id, vrank FROM (
            SELECT c.vec_id AS doc_id,
              row_number() OVER (ORDER BY list_cosine_similarity(
                c.embedding::DOUBLE[],
                (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[])
                DESC, c.vec_id) AS vrank
            FROM embeddings c WHERE c.vec_id <> 0) WHERE vrank <= 100),
        f AS (
          SELECT coalesce(tr.doc_id, vr.doc_id) AS doc_id,
            tr.trank, vr.vrank,
            round(coalesce(CAST(1.0 AS DOUBLE) / (60 + tr.trank), 0) +
                  coalesce(CAST(1.0 AS DOUBLE) / (60 + vr.vrank), 0), 9) AS rrf
          FROM tr FULL JOIN vr ON tr.doc_id = vr.doc_id)
        SELECT doc_id, trank AS text_rank, vrank AS vec_rank, rrf
        FROM f ORDER BY rrf DESC, doc_id LIMIT 20"""))
  }

  /** Seasonal-baseline anomaly rates (Robust.seasonalAnomalies): each
    * event judged against the mean ± 3σ of its own (event_type,
    * day-of-week, hour) calendar cell — the profile monitor that
    * doesn't flag every rush hour. DOW by the portable
    * (epoch_days + 4) % 7 arithmetic (q50's convention). */
  val q162SeasonalAnomaly = Q(
    "q162_seasonal_anomaly",
    (s, d) => {
      val e = events(s, d).select(col("event_type"),
        ((datediff(col("ts").cast("date"),
          lit("1970-01-01").cast("date")) + 4) % 7).as("dow"),
        hour(col("ts")).as("hr"), col("value"))
      graft.operators.Robust.seasonalAnomalies(e,
          Seq("event_type", "dow", "hr"), col("value"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"))
        .select(col("event_type"), col("n_events"), col("n_anomalies"),
          round(col("n_anomalies").cast("double") / col("n_events"), 6)
            .as("anomaly_rate"))
    },
    Some("""WITH e AS (
        SELECT event_type,
          (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 AS dow,
          hour(CAST(ts AS TIMESTAMP)) AS hr,
          value
        FROM events),
      base AS (
        SELECT event_type, dow, hr, count(*) AS n,
          sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS s1,
          sum(CAST(round(value * value, 9) AS DECIMAL(28,9))) AS s2
        FROM e GROUP BY 1, 2, 3),
      j AS (
        SELECT e.event_type, e.value,
          CAST(base.s1 AS DOUBLE) / base.n AS mu,
          sqrt(greatest(
            CAST(base.s2 AS DOUBLE) / base.n
              - (CAST(base.s1 AS DOUBLE) / base.n)
                * (CAST(base.s1 AS DOUBLE) / base.n), 0)) AS sd
        FROM e JOIN base USING (event_type, dow, hr))
      SELECT event_type, count(*) AS n_events,
        CAST(count(*) FILTER (WHERE abs(value - mu) > 3 * sd) AS BIGINT)
          AS n_anomalies,
        round(CAST(count(*) FILTER (WHERE abs(value - mu) > 3 * sd)
          AS DOUBLE) / count(*), 6) AS anomaly_rate
      FROM j GROUP BY 1"""))

  /** Bloom semi-join reduction — the hand-rolled runtime filter for
    * big-big shuffle joins: the selective side's join keys build an 8 KiB
    * bitmap (one partial-agg'd bit_or pass, bounded collect), which
    * pre-filters the fact side MAP-SIDE before any exchange — only
    * probably-matching lineitems enter the shuffle. No false negatives,
    * so the subsequent real join removes the Bloom's false positives and
    * the result is EXACTLY the plain join (which is the oracle: DuckDB
    * runs the unfiltered join). Revenue under the decimal-exact regime. */
  val q163BloomSemijoin = Q(
    "q163_bloom_semijoin",
    (s, d) => {
      val o = orders(s, d)
        .where(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1994)
        .select("o_orderkey")
      val m = 1 << 16
      val seeds = Seq(1, 2, 3)
      val bitmap = graft.operators.Sketches.bloomBitmap(
        o, col("o_orderkey"), m, seeds)
      lineitem(s, d)
        .where(graft.operators.Sketches.bloomMightContain(
          col("l_orderkey"), bitmap, m, seeds))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n_lineitems"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          round(dsum(revDec), 2).as("revenue"))
    },
    Some("""SELECT count(*) AS n_lineitems,
        CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1.00 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,6)))
          AS DOUBLE), 2) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT'
        AND year(o_orderdate) = 1994"""))

  /** Exponential smoothing (TimeSeries.ewma): per-priority monthly
    * revenue under simple exponential smoothing, α=0.3. Monthly sums are
    * decimal-exact and rounded BEFORE the fold so both engines smooth
    * identical doubles; the sequential recurrence is a per-key array
    * fold here and a recursive CTE in the oracle — same left-to-right
    * order, bit-identical at 6 dp. */
  val q164Ewma = Q(
    "q164_ewma",
    (s, d) => {
      val monthly = orders(s, d)
        .groupBy(col("o_orderpriority"),
          trunc(col("o_orderdate").cast("date"), "month").as("month"))
        .agg(round(dsum(col("o_totalprice")), 6).as("v"))
      graft.operators.TimeSeries.ewma(monthly, Seq("o_orderpriority"),
          "month", col("v"), alpha = 0.3)
        .withColumnRenamed("value", "revenue")
    },
    Some("""WITH RECURSIVE m0 AS (
        SELECT o_orderpriority, CAST(date_trunc('month',
            CAST(o_orderdate AS DATE)) AS DATE) AS mth,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS v
        FROM orders GROUP BY 1, 2),
      m AS (
        SELECT o_orderpriority, mth, v,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY mth) AS rn
        FROM m0),
      r AS (
        SELECT o_orderpriority, mth, v, rn, v AS y FROM m WHERE rn = 1
        UNION ALL
        SELECT m.o_orderpriority, m.mth, m.v, m.rn,
          CAST(0.3 AS DOUBLE) * m.v + CAST(0.7 AS DOUBLE) * r.y
        FROM m JOIN r ON m.o_orderpriority = r.o_orderpriority
          AND m.rn = r.rn + 1)
      SELECT o_orderpriority, mth AS month, v AS revenue,
        round(y, 6) AS ewma
      FROM r"""))

  private def pprRoundSql(prev: String, k: Int): String = s"""
      pc$k AS (
        SELECT e.dst AS node,
          CAST(sum(CAST(round(s.rank / s.outdeg, 12) AS DECIMAL(28,12))) AS DOUBLE) AS in_sum
        FROM $prev s JOIN e ON s.node = e.src
        GROUP BY 1),
      pd$k AS (
        SELECT coalesce(CAST(sum(CAST(round(rank, 12) AS DECIMAL(28,12))) AS DOUBLE), 0.0) AS mass
        FROM $prev WHERE outdeg IS NULL),
      ps$k AS MATERIALIZED (
        SELECT s.node, s.outdeg, s.p,
          round(CAST(0.15 AS DOUBLE) * s.p + CAST(0.85 AS DOUBLE) *
            (coalesce(c.in_sum, 0.0) + d.mass * s.p), 12) AS rank
        FROM $prev s LEFT JOIN pc$k c USING (node) CROSS JOIN pd$k d)"""

  /** Personalized PageRank (Graph.personalizedPageRank): supplier
    * proximity to a seed CUSTOMER set (custkey ≡ 0 mod 97) on the same
    * referral graph as q123 — rank mass teleports to the seeds, so this
    * answers "which suppliers serve these customers' neighborhoods",
    * not global importance. 4 unrolled rounds, 12-dp hash parity. */
  val q165PersonalizedPr = Q(
    "q165_personalized_pr",
    (s, d) => {
      val e = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val isSeed = (node: Column) =>
        node.startsWith("c") &&
          expr("CAST(substring(node, 2) AS BIGINT)") % 97 === 0
      graft.graph.Graph.personalizedPageRank(e, isSeed, iterations = 4)
        .where(col("node").startsWith("s"))
        .orderBy(col("rank").desc, col("node"))
        .limit(30)
        .select(col("node"), round(col("rank"), 12).as("rank"))
    },
    Some(s"""WITH e AS MATERIALIZED (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
          's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
      m AS (
        SELECT count(*) AS ns FROM nodes
        WHERE node LIKE 'c%' AND CAST(substring(node, 2) AS BIGINT) % 97 = 0),
      ps0 AS MATERIALIZED (
        SELECT nd.node, dg.outdeg,
          round(CASE WHEN nd.node LIKE 'c%'
                      AND CAST(substring(nd.node, 2) AS BIGINT) % 97 = 0
                THEN CAST(1.0 AS DOUBLE) / m.ns ELSE 0.0 END, 12) AS p,
          round(CASE WHEN nd.node LIKE 'c%'
                      AND CAST(substring(nd.node, 2) AS BIGINT) % 97 = 0
                THEN CAST(1.0 AS DOUBLE) / m.ns ELSE 0.0 END, 12) AS rank
        FROM nodes nd LEFT JOIN deg dg USING (node) CROSS JOIN m),
      ${(1 to 4).map(k => pprRoundSql(s"ps${k - 1}", k)).mkString(",\n")}
      SELECT node, rank FROM ps4
      WHERE node LIKE 's%'
      ORDER BY rank DESC, node LIMIT 30"""))

  /** Zipf-law fit over the token-frequency head — the corpus-health
    * statistic (natural text reads slope ≈ −1 on log rank vs log count;
    * synthetic/templated corpora drift). The vocabulary head is a
    * TakeOrdered top-1000 (no global window over the vocab), ranked
    * under a constKey-bounded window; the regression is closed-form OLS
    * over 12-dp-rounded log terms summed exactly as decimal — q138's
    * sufficient-statistics shape on log-transformed data. */
  val q166ZipfFit = Q(
    "q166_zipf_fit",
    (s, d) => {
      val counts = documents(s, d)
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val top = counts.orderBy(col("c").desc, col("tok")).limit(1000)
      val wR = Window
        .partitionBy(graft.operators.Guards.constKey(col("tok")))
        .orderBy(col("c").desc, col("tok"))
      val ranked = top.withColumn("r", row_number().over(wR))
        .select(
          round(log(col("r").cast("double")), 12)
            .cast("decimal(28,12)").as("x"),
          round(log(col("c").cast("double")), 12)
            .cast("decimal(28,12)").as("y"))
      val a = ranked.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(round(col("x").cast("double") * col("y").cast("double"), 12)
          .cast("decimal(38,12)")).as("sxy"),
        sum(round(col("x").cast("double") * col("x").cast("double"), 12)
          .cast("decimal(38,12)")).as("sxx"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
      val sxy = col("sxy").cast("double"); val sxx = col("sxx").cast("double")
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      a.select(col("n"),
        round(slope, 6).as("zipf_slope"),
        round((sy - slope * sx) / n, 6).as("intercept"))
    },
    Some("""WITH t AS (
        SELECT CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
               THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
          END AS toks
        FROM documents),
      counts AS (
        SELECT tok, count(*) AS c
        FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
      top AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 1000),
      ranked AS (
        SELECT
          CAST(round(ln(CAST(row_number() OVER (ORDER BY c DESC, tok) AS DOUBLE)), 12)
            AS DECIMAL(28,12)) AS x,
          CAST(round(ln(CAST(c AS DOUBLE)), 12) AS DECIMAL(28,12)) AS y
        FROM top),
      a AS (
        SELECT count(*) AS n,
          sum(x) AS sx, sum(y) AS sy,
          sum(CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE), 12)
            AS DECIMAL(38,12))) AS sxy,
          sum(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
            AS DECIMAL(38,12))) AS sxx
        FROM ranked)
      SELECT n,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
        round((CAST(sy AS DOUBLE)
            - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * CAST(sx AS DOUBLE))
          / CAST(n AS DOUBLE), 6) AS intercept
      FROM a"""))

  /** Hybrid skew join (Joins.skewHybridJoin): events⋈user-segment with
    * heavy users split to a broadcast branch and the balanced remainder
    * taking the ordinary shuffle — the few-hot-keys alternative to
    * q91's salting. The split∪ is exactly the plain join, which is the
    * oracle (DuckDB runs it split-free). */
  val q167SkewHybrid = Q(
    "q167_skew_hybrid_join",
    (s, d) => {
      val e = events(s, d).select("user_id", "ts", "event_id",
        "event_type", "value")
      val dim = e.groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("segment"))
      graft.operators.Joins.skewHybridJoin(
          e.select("user_id", "event_type", "value"), dim, "user_id",
          hotThreshold = 68)
        .groupBy("segment", "event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("value"), 9).cast("decimal(28,9)"))
            .cast("double"), 6).as("sum_value"))
    },
    Some("""WITH dim AS (
        SELECT user_id, event_type AS segment FROM (
          SELECT user_id, event_type,
            row_number() OVER (PARTITION BY user_id
              ORDER BY ts, event_id, event_type) AS rn
          FROM events) WHERE rn = 1)
      SELECT d.segment, e.event_type, count(*) AS n,
        round(CAST(sum(CAST(round(e.value, 9) AS DECIMAL(28,9))) AS DOUBLE), 6)
          AS sum_value
      FROM events e JOIN dim d USING (user_id)
      GROUP BY 1, 2"""))

  /** Incremental rollup via mergeable exact partials (operators.Partials):
    * the event stream lands as two batches (event_id parity — any
    * partition works, that's the point), each reduced to per-type
    * (n, Σv, min, max, Σv²) state; the readout comes from MERGED state,
    * never re-touching the raw rows. The oracle computes the same
    * moments directly over all events — equality IS the
    * merge-invariance contract. */
  val q168IncrementalRollup = Q(
    "q168_incremental_rollup",
    (s, d) => {
      import graft.operators.Partials
      val e = events(s, d).select(col("event_id"), col("event_type"),
        col("value"))
      val batchA = Partials.build(
        e.where(col("event_id") % 2 === 0), Seq("event_type"), col("value"))
      val batchB = Partials.build(
        e.where(col("event_id") % 2 === 1), Seq("event_type"), col("value"))
      Partials.finish(
        Partials.merge(batchA.unionByName(batchB), Seq("event_type")),
        Seq("event_type"))
    },
    Some("""SELECT event_type,
        count(*) AS n,
        round(CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE), 6)
          AS sum_value,
        min(value) AS min_value,
        max(value) AS max_value,
        round(CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE)
          / count(*), 6) AS mean,
        round(greatest(
          CAST(sum(CAST(round(value * value, 9) AS DECIMAL(28,9))) AS DOUBLE)
            / count(*)
          - (CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE)
             / count(*))
            * (CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9))) AS DOUBLE)
               / count(*)), 0), 6) AS variance
      FROM events GROUP BY 1"""))

  /** Time-weighted average per user (Windows.timeWeightedAverage): each
    * reading holds until the next, so idle-period values stop being
    * drowned by burst samples. Decimal×micros exact arithmetic; the
    * single divide is the only float op. */
  val q169TimeWeighted = Q(
    "q169_time_weighted_avg",
    (s, d) =>
      graft.operators.Windows.timeWeightedAverage(
        events(s, d), Seq("user_id"), col("ts"), col("event_id"),
        col("value")),
    Some("""WITH o AS (
        SELECT user_id, value,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us,
          lead(epoch_us(CAST(ts AS TIMESTAMP)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events)
      SELECT user_id, count(*) AS n_intervals,
        round(CAST(sum(nxt - us) AS DOUBLE) / 1e6, 6) AS span_seconds,
        round(CAST(sum(CAST(round(value, 9) AS DECIMAL(28,9)) * (nxt - us))
            AS DOUBLE)
          / CAST(sum(nxt - us) AS DOUBLE), 6) AS twa
      FROM o WHERE nxt IS NOT NULL
      GROUP BY 1"""))

  /** Directed containment join (Dedup.containmentJoin): near-superset /
    * quotation pairs C(a→b) = |Sa∩Sb|/|Sa| ≥ 0.6 over 5-gram shingles —
    * the asymmetric dup signal Jaccard structurally misses. Same
    * lossless rare-prefix candidate machinery as q107, one-sided. */
  val q170Containment = Q(
    "q170_containment_join",
    (s, d) =>
      Dedup.containmentJoin(documents(s, d), "doc_id", "text",
        n = 5, threshold = 0.6),
    Some(s"""WITH t AS ($duckToksSql),
      s0 AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i
        FROM t WHERE len(toks) >= 5),
      dt AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i : i + 4], ' ') AS tok
        FROM s0),
      sets AS (
        SELECT doc_id, list(tok) AS st, count(*) AS sz
        FROM dt GROUP BY 1),
      th AS (
        SELECT doc_id, tok,
          ('0x' || substr(md5('0:' || tok), 1, 15))::BIGINT AS h
        FROM dt),
      dfq AS (SELECT h, count(*) AS c FROM th GROUP BY 1),
      ranked AS (
        SELECT doc_id, h,
          row_number() OVER (PARTITION BY doc_id ORDER BY c, h, tok) AS r,
          count(*) OVER (PARTITION BY doc_id) AS sz
        FROM th JOIN dfq USING (h)),
      pre AS (
        SELECT doc_id AS id1, sz AS z1, h AS ptok
        FROM ranked WHERE r <= sz - ceil(0.6 * sz) + 1),
      cand AS (
        SELECT DISTINCT pre.id1, b.doc_id AS id2, pre.z1
        FROM pre JOIN ranked b ON pre.ptok = b.h AND pre.id1 <> b.doc_id
        WHERE b.sz >= ceil(0.6 * pre.z1)),
      c AS (
        SELECT id1, id2,
          CAST(len(list_intersect(sa.st, sb.st)) AS DOUBLE) / z1 AS cont
        FROM cand
        JOIN sets sa ON cand.id1 = sa.doc_id
        JOIN sets sb ON cand.id2 = sb.doc_id)
      SELECT id1, id2, round(cont, 6) AS containment
      FROM c WHERE cont >= 0.6"""))

  /** Weekly trending ranks with week-over-week movement — the
    * "what's rising" readout: per-week event-type ranks (keyed window,
    * weeks bounded by the calendar) and each type's rank delta vs its
    * previous week under one keyed lag. All-integer arithmetic; both
    * engines truncate weeks to Monday. */
  val q171Trending = Q(
    "q171_trending",
    (s, d) => {
      val weekly = events(s, d)
        .groupBy(trunc(col("ts").cast("date"), "week").as("week"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val wRank = Window.partitionBy("week")
        .orderBy(col("n").desc, col("event_type"))
      val wPrev = Window.partitionBy("event_type").orderBy("week")
      weekly
        .withColumn("rank", row_number().over(wRank))
        .withColumn("rank_delta",
          coalesce(lag(col("rank"), 1).over(wPrev) - col("rank"), lit(0)))
        .select("week", "event_type", "n", "rank", "rank_delta")
    },
    Some("""WITH w AS (
        SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
          event_type, count(*) AS n
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT week, event_type, n,
          CAST(row_number() OVER (PARTITION BY week
            ORDER BY n DESC, event_type) AS INT) AS rank
        FROM w)
      SELECT week, event_type, n, rank,
        CAST(coalesce(lag(rank) OVER (PARTITION BY event_type ORDER BY week)
          - rank, 0) AS INT) AS rank_delta
      FROM r"""))

  /** Table diff / reconciliation audit (Reshape.tableDiff): orders vs a
    * deterministically patched version (every 97th key dropped, every
    * 89th price bumped, every 83rd re-keyed in as new) — the
    * added/removed/changed/unchanged census a pipeline migration signs
    * off on. One full-outer key join, null-safe struct compare. */
  val q172TableDiff = Q(
    "q172_table_diff",
    (s, d) => {
      val before = orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val after = before.where(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 89 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
        .unionByName(before.where(col("o_orderkey") % 83 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L)))
      graft.operators.Reshape.tableDiff(before, after, Seq("o_orderkey"),
          Seq("o_totalprice", "o_orderstatus"))
        .groupBy("status").agg(count(lit(1)).as("n"))
    },
    Some("""WITH b AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
      a AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
               ELSE o_totalprice END AS o_totalprice,
          o_orderstatus
        FROM b WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 1000000000, o_totalprice, o_orderstatus
        FROM b WHERE o_orderkey % 83 = 0),
      d AS (
        SELECT CASE WHEN b.o_orderkey IS NULL THEN 'added'
                    WHEN a.o_orderkey IS NULL THEN 'removed'
                    WHEN b.o_totalprice IS NOT DISTINCT FROM a.o_totalprice
                     AND b.o_orderstatus IS NOT DISTINCT FROM a.o_orderstatus
                    THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM b FULL JOIN a ON b.o_orderkey = a.o_orderkey)
      SELECT status, count(*) AS n FROM d GROUP BY 1"""))

  /** Trailing-window uniques from daily sketch partials: per-day HLL
    * user sketches (the once-per-ingest artifact) answer every trailing
    * 7-day distinct-user question by sketch-union — no rescan of raw
    * events, the temporal form of the q53/q158 mergeable-partial
    * contract. Day-level self-join (≤7× day-count rows, calendar-scale);
    * the oracle pins exact trailing uniques + a 3·RSE bounds boolean. */
  val q173TrailingUniques = Q(
    "q173_trailing_uniques",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
          count(lit(1)).as("n_events"))
      val trail = daily.as("t")
        .join(daily.select(col("day").as("d2"), col("sk").as("sk2")).as("u"),
          col("d2").between(date_sub(col("day"), 6), col("day")))
        .groupBy(col("day"), col("n_events"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk2"), lit(true)))
          .cast("double").as("est_u7"))
      val exact = events(s, d)
        .select(col("ts").cast("date").as("d2"), col("user_id")).distinct()
        .withColumn("day", explode(sequence(col("d2"),
          date_add(col("d2"), 6))))
        .select("day", "user_id").distinct()
        .groupBy("day").agg(count(lit(1)).as("exact_u7"))
      trail.join(exact, Seq("day"))
        .select(col("day"), col("n_events"), col("exact_u7"),
          (abs(col("est_u7") - col("exact_u7")) / col("exact_u7") <= 0.05)
            .as("within_3rse"))
    },
    Some("""WITH e AS (
        SELECT CAST(ts AS DATE) AS d2, user_id FROM events),
      days AS (SELECT DISTINCT d2 AS day FROM e),
      n AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events GROUP BY 1),
      ex AS (
        SELECT days.day, count(DISTINCT e.user_id) AS exact_u7
        FROM days JOIN e ON e.d2 BETWEEN days.day - 6 AND days.day
        GROUP BY 1)
      SELECT day, n.n_events, CAST(ex.exact_u7 AS BIGINT) AS exact_u7,
        true AS within_3rse
      FROM ex JOIN n USING (day)"""))

  /** PMI collocations (Church & Hanks 1990): top adjacent token pairs by
    * pointwise mutual information, min support 5 — the collocation
    * extractor corpus linguistics runs before phrase-aware tokenization.
    * Exact counts everywhere; PMI is one fixed-order scalar per pair;
    * unigram dims join on the token key, totals ride one-row constKey
    * broadcasts; the cut is TakeOrdered on (rounded PMI, pair). */
  val q174PmiCollocations = Q(
    "q174_pmi_collocations",
    (s, d) => {
      val toks = documents(s, d)
        .select(col("doc_id"), Text.tokens(col("text")).as("__toks"))
        .where(size(col("__toks")) >= 2)
      val bi = toks.select(
          explode(zip_with(
            slice(col("__toks"), lit(1), size(col("__toks")) - 1),
            slice(col("__toks"), lit(2), size(col("__toks")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("c_ab"))
      val uni = documents(s, d)
        .select(explode(Text.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val totals = uni.agg(sum("c").as("t_uni"),
          Guards.constKey(min(col("tok"))).as("__k"))
      val bTotal = bi.agg(sum("c_ab").as("t_bi"),
          Guards.constKey(min(col("a"))).as("__k"))
      val pmi = log2((col("c_ab").cast("double") / col("t_bi")) /
        ((col("c_a").cast("double") / col("t_uni")) *
          (col("c_b").cast("double") / col("t_uni"))))
      bi.where(col("c_ab") >= 5)
        .join(uni.select(col("tok").as("a"), col("c").as("c_a")), Seq("a"))
        .join(uni.select(col("tok").as("b"), col("c").as("c_b")), Seq("b"))
        .withColumn("__k", Guards.constKey(col("a")))
        .join(broadcast(totals), "__k")
        .join(broadcast(bTotal), "__k")
        .select(col("a"), col("b"), col("c_ab"), round(pmi, 6).as("pmi"))
        .orderBy(col("pmi").desc, col("a"), col("b")).limit(20)
    },
    Some("""WITH t AS (
        SELECT doc_id,
          CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
               THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
          END AS toks
        FROM documents),
      bi AS (
        SELECT toks[i] AS a, toks[i + 1] AS b, count(*) AS c_ab
        FROM (SELECT toks, unnest(range(1, len(toks))) AS i
              FROM t WHERE len(toks) >= 2)
        GROUP BY 1, 2),
      uni AS (
        SELECT tok, count(*) AS c
        FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
      tu AS (SELECT sum(c) AS t_uni FROM uni),
      tb AS (SELECT sum(c_ab) AS t_bi FROM bi)
      SELECT bi.a, bi.b, bi.c_ab,
        round(log2((CAST(bi.c_ab AS DOUBLE) / t_bi) /
          ((CAST(ua.c AS DOUBLE) / t_uni)
            * (CAST(ub.c AS DOUBLE) / t_uni))), 6) AS pmi
      FROM bi
      JOIN uni ua ON bi.a = ua.tok
      JOIN uni ub ON bi.b = ub.tok
      CROSS JOIN tu CROSS JOIN tb
      WHERE bi.c_ab >= 5
      ORDER BY pmi DESC, bi.a, bi.b LIMIT 20"""))

  /** Per-slice quantile drift vs the corpus (data-drift monitor): each
    * event type's value deciles against the global deciles, reported as
    * max and mean absolute gap — the distribution-shift readout a
    * feature pipeline alarms on. Exact interpolated percentiles (q34's
    * proven quantile_cont parity) on both sides; the global decile row
    * broadcasts on a constKey. */
  val q175QuantileDrift = Q(
    "q175_quantile_drift",
    (s, d) => {
      val decs = (1 to 9).map(_ / 10.0)
      val decArray = array(decs.map(lit): _*)
      val byType = events(s, d).groupBy("event_type")
        .agg(percentile(col("value"), decArray).as("qs"))
      val global = events(s, d)
        .agg(percentile(col("value"), decArray).as("gqs"),
          Guards.constKey(min(col("event_type"))).as("__k"))
      val gaps = zip_with(col("qs"), col("gqs"), (a, b) => abs(a - b))
      byType.withColumn("__k", Guards.constKey(col("event_type")))
        .join(broadcast(global), "__k")
        .select(col("event_type"),
          round(array_max(gaps), 6).as("max_drift"),
          round(aggregate(gaps, lit(0.0), (acc, x) => acc + x) / 9.0, 6)
            .as("mean_drift"))
    },
    Some("""WITH g AS (
        SELECT quantile_cont(value,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS gqs
        FROM events),
      t AS (
        SELECT event_type, quantile_cont(value,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
        FROM events GROUP BY 1)
      SELECT event_type,
        round(list_max(list_transform(range(1, 10),
          i -> abs(qs[i] - gqs[i]))), 6) AS max_drift,
        round(list_reduce(list_transform(range(1, 10),
          i -> abs(qs[i] - gqs[i])), (a, b) -> a + b) / 9.0, 6) AS mean_drift
      FROM t CROSS JOIN g"""))

  /** Rendezvous-sharding rebalance audit (Packing.rendezvousShard): the
    * consistent-sharding guarantee as an exact census — growing 16→17
    * shards, HRW moves only the keys shard 16 wins (≈1/17) while mod
    * hashing moves ≈16/17. The census that justifies HRW layouts for
    * incremental reprocessing at scale; oracle replays the identical
    * md5 scores in SQL. */
  val q176RendezvousShard = Q(
    "q176_rendezvous_shard",
    (s, d) => {
      import graft.operators.Packing
      val key = col("doc_id")
      val h = Text.md5Hash64(key.cast("string"), 0)
      documents(s, d).select(
          Packing.rendezvousShard(key, 16).as("r16"),
          Packing.rendezvousShard(key, 17).as("r17"),
          pmod(h, lit(16L)).as("m16"),
          pmod(h, lit(17L)).as("m17"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("r16") =!= col("r17"), 1L).otherwise(0L))
            .as("moved_rendezvous"),
          sum(when(col("m16") =!= col("m17"), 1L).otherwise(0L))
            .as("moved_mod"))
        .select(col("n_docs"), col("moved_rendezvous"), col("moved_mod"),
          round(col("moved_rendezvous").cast("double") / col("n_docs"), 6)
            .as("frac_rendezvous"),
          round(col("moved_mod").cast("double") / col("n_docs"), 6)
            .as("frac_mod"),
          (col("moved_rendezvous") < col("moved_mod"))
            .as("rendezvous_more_stable"))
    },
    Some("""WITH s AS (
        SELECT doc_id, i,
          ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
            CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM documents, unnest(range(0, 17)) AS t(i)),
      r17 AS (
        SELECT doc_id, i AS r17 FROM (
          SELECT doc_id, i,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY h DESC, i DESC) AS rn
          FROM s) WHERE rn = 1),
      r16 AS (
        SELECT doc_id, i AS r16 FROM (
          SELECT doc_id, i,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY h DESC, i DESC) AS rn
          FROM s WHERE i < 16) WHERE rn = 1),
      m AS (
        SELECT doc_id,
          ('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
            AS h0
        FROM documents),
      j AS (
        SELECT r16.r16, r17.r17, m.h0 % 16 AS m16, m.h0 % 17 AS m17
        FROM r16 JOIN r17 USING (doc_id) JOIN m USING (doc_id))
      SELECT count(*) AS n_docs,
        CAST(count(*) FILTER (WHERE r16 <> r17) AS BIGINT) AS moved_rendezvous,
        CAST(count(*) FILTER (WHERE m16 <> m17) AS BIGINT) AS moved_mod,
        round(CAST(count(*) FILTER (WHERE r16 <> r17) AS DOUBLE) / count(*), 6)
          AS frac_rendezvous,
        round(CAST(count(*) FILTER (WHERE m16 <> m17) AS DOUBLE) / count(*), 6)
          AS frac_mod,
        count(*) FILTER (WHERE r16 <> r17) < count(*) FILTER (WHERE m16 <> m17)
          AS rendezvous_more_stable
      FROM j"""))

  /** Benford first-digit audit (Newcomb 1881 / Benford 1938): observed
    * first-significant-digit frequencies of order totals against the
    * log10(1+1/d) law — the forensic data-quality screen for fabricated
    * or truncated numeric columns. The digit comes from the DECIMAL
    * string (both engines format decimals identically), never from
    * float log10/pow whose ulp at exact powers of ten could flip a
    * digit between engines. */
  val q177BenfordAudit = Q(
    "q177_benford_audit",
    (s, d) => {
      val digit = substring(regexp_replace(
        col("o_totalprice").cast("decimal(18,2)").cast("string"),
        "[^1-9]", ""), 1, 1)
      orders(s, d)
        .where(col("o_totalprice") > 0)
        .groupBy(digit.as("digit"))
        .agg(count(lit(1)).as("n_obs"))
        .withColumn("__k", graft.operators.Guards.constKey(col("digit")))
        .join(broadcast(
          orders(s, d).where(col("o_totalprice") > 0)
            .agg(count(lit(1)).as("n_total"),
              graft.operators.Guards.constKey(count(lit(1))).as("__k"))),
          "__k")
        .select(col("digit"), col("n_obs"),
          round(log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double"))
            * col("n_total"), 6).as("n_expected"),
          round((col("n_obs") - log(10.0,
            lit(1.0) + lit(1.0) / col("digit").cast("double")) * col("n_total"))
            / (log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double"))
              * col("n_total")), 6).as("rel_deviation"))
    },
    Some("""WITH o AS (
        SELECT substr(regexp_replace(
            CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
            '[^1-9]', '', 'g'), 1, 1) AS digit
        FROM orders WHERE o_totalprice > 0),
      c AS (SELECT digit, count(*) AS n_obs FROM o GROUP BY 1),
      t AS (SELECT sum(n_obs) AS n_total FROM c)
      SELECT digit, n_obs,
        -- ln-quotient, NOT log10(): Spark's LOG(10, x) computes
        -- ln(x)/ln(10) and the trees must match to the last ulp
        round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * n_total, 6)
          AS n_expected,
        round((n_obs - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)
            * n_total)
          / (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * n_total), 6)
          AS rel_deviation
      FROM c CROSS JOIN t"""))

  /** Inter-source overlap matrix: exact Jaccard between every pair of
    * SOURCES over their distinct 8-gram shingle sets — "how much of
    * source A is also in source B", the corpus-procurement audit that
    * decides what a new source actually adds. The pair fan-out rides
    * the shingle key (each shingle meets ≤ |sources| carriers, a
    * config-scale bound), never doc×doc; q158 is this audit's sketch
    * form, this is the exact one. */
  val q178SourceOverlap = Q(
    "q178_source_overlap",
    (s, d) => {
      val sh = documents(s, d)
        .select(col("source"),
          explode(Text.wordShingles(col("text"), 8)).as("tok"))
        .select(col("source"), Text.md5Hash64(col("tok"), 0).as("key"))
        .distinct()
      val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = sh.as("a")
        .join(sh.as("b"),
          col("a.key") === col("b.key") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("n_shared"))
      inter
        .join(broadcast(sizes.select(col("source").as("s1"), col("n").as("n1"))),
          Seq("s1"))
        .join(broadcast(sizes.select(col("source").as("s2"), col("n").as("n2"))),
          Seq("s2"))
        .select(col("s1"), col("s2"), col("n_shared"),
          round(col("n_shared").cast("double") /
            (col("n1") + col("n2") - col("n_shared")), 6).as("jaccard"))
    },
    Some("""WITH t AS (
        SELECT source,
          CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
               THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
          END AS toks
        FROM documents),
      sh AS (
        SELECT DISTINCT source,
          ('0x' || substr(md5('0:' ||
            array_to_string(toks[i : i + 7], ' ')), 1, 15))::BIGINT AS key
        FROM (SELECT source, toks, unnest(range(1, len(toks) - 6)) AS i
              FROM t WHERE len(toks) >= 8)),
      n AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
      i AS (
        SELECT a.source AS s1, b.source AS s2, count(*) AS n_shared
        FROM sh a JOIN sh b ON a.key = b.key AND a.source < b.source
        GROUP BY 1, 2)
      SELECT s1, s2, n_shared,
        round(CAST(n_shared AS DOUBLE) / (na.n + nb.n - n_shared), 6)
          AS jaccard
      FROM i JOIN n na ON i.s1 = na.source JOIN n nb ON i.s2 = nb.source"""))

  /** q123's cluster layout, under the oracle gate: the SAME customer→
    * supplier PageRank, but the deduped edge set is first written ONCE as
    * a src-bucketed table ([[graft.sources.Sinks.writeBucketed]]) and the
    * ranker runs with `edgesPrepared = true` — no re-distinct, no
    * checkpoint of the edge frame — so every one of the 6 rounds joins
    * the bucketed scan with ZERO edge-side exchanges
    * (GraphClusterPlanSpec locks the plan; this query locks the hashes:
    * same oracle as q123, bit-identical ranks). This is the one-time
    * layout that replaces q123's per-round ~20 MB edge re-shuffle when
    * the edge set is 100 TB-class: the bucketing IS the exchange, paid
    * once at write time. */
  /** q179's bucketed edge table, staged ONCE per (process, sfDir): the
    * one-time layout write is setup, not the per-round ranker under
    * test — re-writing it on every bench iteration billed the layout to
    * steady state (12.5-16.4 s for a plan the spec proves CHEAPER per
    * round than q123's 7.3 s; r07 verdict item 2, the q112 pathology in
    * sink form). computeIfAbsent serializes concurrent stagers per
    * sfDir, and the table name is keyed by the sfDir tag so concurrent
    * catalog runs in one JVM never race on a shared name (r07 advice). */
  private val q179EdgesByDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Stage the deduped customer→supplier edge set as a src-bucketed
    * table ONCE per (process, sfDir) and return its name — shared by
    * q179 (fixed rounds) and q232 (convergence stop) so the catalog
    * pays the one-time layout once, the way a cluster would. */
  private[graft] def stagedBucketedEdges(s: SparkSession, d: String)
      : String = {
    val tag = d.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9_]", "_")
    q179EdgesByDir.computeIfAbsent(d, _ => {
      val name = s"q179_edges_$tag"
      val e = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      // 32 buckets = the session's core count: buckets bound the
      // zero-exchange path's per-round parallelism (scan+join+agg all
      // run bucket-wise), and the r08 sf1 probe measured 8 buckets
      // leaving 3/4 of local[32] idle — 6 rounds over 10x the edges
      // ran FASTER at 32 buckets than this query did at 8. On a
      // cluster you'd size buckets to the executor-core fleet.
      graft.sources.Sinks.writeBucketed(e, name, 32, "src")
      name
    })
  }

  val q179PagerankBucketed = Q(
    "q179_pagerank_bucketed",
    (s, d) => {
      graft.graph.Graph.pageRank(s.table(stagedBucketedEdges(s, d)),
          iterations = 6, edgesPrepared = true)
        .where(col("node").startsWith("s"))
        .orderBy(col("rank").desc, col("node"))
        .limit(30)
        .select(col("node"), round(col("rank"), 12).as("rank"))
    },
    q123PageRank.oracle)

  /** 3-way Z-order layout audit (Layout.zorderKeyN / zTileN): cluster
    * lineitem on the k=3 Morton interleave of (partkey, suppkey,
    * orderkey) buckets — the source × lang × date shape of a real layout
    * tune — and measure what a 3-D box predicate scans under 4×4×4
    * z-tiles. Same exact relational pruning arithmetic as q159's 2-D
    * audit; LayoutSpec separately proves the partition-level file
    * pruning the tile id buys at read time. */
  val q180Zorder3 = Q(
    "q180_zorder3",
    (s, d) => {
      import graft.operators.Layout
      val x = pmod(col("l_partkey"), lit(32)).cast("int")
      val y = pmod(col("l_suppkey"), lit(32)).cast("int")
      val w = pmod(col("l_orderkey"), lit(32)).cast("int")
      val tiled = lineitem(s, d)
        .select(x.as("x"), y.as("y"), w.as("w"))
        .withColumn("zb", Layout.zTileN(
          Layout.zorderKeyN(Seq(col("x"), col("y"), col("w")), 5), 2, 3))
      val inBox = col("x").between(8, 15) && col("y").between(16, 23) &&
        col("w").between(4, 11)
      tiled.groupBy("zb")
        .agg(count(lit(1)).as("tile_rows"),
          count(when(inBox, 1)).as("box_rows"))
        .agg(count(lit(1)).as("n_tiles"),
          sum(when(col("box_rows") > 0, 1L).otherwise(0L)).as("tiles_touched"),
          sum("box_rows").as("rows_in_box"),
          sum(when(col("box_rows") > 0, col("tile_rows")).otherwise(0L))
            .as("rows_scanned"),
          sum("tile_rows").as("rows_total"))
        .select(col("n_tiles"), col("tiles_touched"), col("rows_in_box"),
          col("rows_scanned"), col("rows_total"),
          round(col("rows_scanned").cast("double") / col("rows_total"), 6)
            .as("scan_fraction"))
    },
    Some {
      val zExpr = (0 until 5).flatMap(i => Seq(
        s"(((x >> $i) & 1) << ${3 * i})",
        s"(((y >> $i) & 1) << ${3 * i + 1})",
        s"(((w >> $i) & 1) << ${3 * i + 2})"))
        .mkString(" | ")
      s"""WITH b AS (
        SELECT CAST(l_partkey % 32 AS INT) AS x,
               CAST(l_suppkey % 32 AS INT) AS y,
               CAST(l_orderkey % 32 AS INT) AS w
        FROM lineitem),
      t AS (
        SELECT ($zExpr) >> 6 AS zb,
          count(*) AS tile_rows,
          count(*) FILTER (WHERE x BETWEEN 8 AND 15
                             AND y BETWEEN 16 AND 23
                             AND w BETWEEN 4 AND 11) AS box_rows
        FROM b GROUP BY 1)
      SELECT CAST(count(*) AS BIGINT) AS n_tiles,
        CAST(count(*) FILTER (WHERE box_rows > 0) AS BIGINT) AS tiles_touched,
        CAST(sum(box_rows) AS BIGINT) AS rows_in_box,
        CAST(sum(CASE WHEN box_rows > 0 THEN tile_rows ELSE 0 END) AS BIGINT)
          AS rows_scanned,
        CAST(sum(tile_rows) AS BIGINT) AS rows_total,
        round(CAST(sum(CASE WHEN box_rows > 0 THEN tile_rows ELSE 0 END)
          AS DOUBLE) / sum(tile_rows), 6) AS scan_fraction
      FROM t"""
    })

  /** ANN retrieval QUALITY under the driver gate (r06/r07 carry): every
    * approximate index in the catalog scored as recall@5 against q26's
    * brute-force cosine ground truth over the same 10 probes — LSH
    * (q29), multi-probe LSH (q109), IVF (q81) and random-projection
    * rerank (q147) — plus an ADC ordering-agreement score for IVF-PQ
    * (q120, whose contract is distance-ranked retrieval for one query:
    * the overlap of its top-5 by quantized distance vs top-5 by exact
    * distance within the returned 10). Exact hit counting over exact
    * rational fractions, so the quality numbers hash-match in DuckDB —
    * the gate now pins retrieval QUALITY, not just determinism; until
    * this query, an LSH regression that tanked recall but stayed
    * deterministic would have sailed through. The oracle composes the
    * constituent queries' own oracle SQL as derived tables, so both
    * engines replay the identical pipelines end-to-end. */
  val q181AnnRecall = Q(
    "q181_ann_recall",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.Guards
      // materialized once (50 rows): the truth subtree feeds four scorer
      // joins plus the probe spine — left lazy, the brute-force pipeline
      // re-executes per branch (measured ~10.5 s steady; checkpointed,
      // the branches share one 50-row local table)
      val truth = q26Knn.run(s, d).select(col("probe_id"), col("neighbor_id"))
        .localCheckpoint()
      val probeList = truth.select("probe_id").distinct()
      def recall(method: String, res: DataFrame): DataFrame = {
        val hits = res.select(col("probe_id"), col("neighbor_id"))
          .join(truth, Seq("probe_id", "neighbor_id"))
          .groupBy(col("probe_id")).agg(count(lit(1)).as("hits"))
        probeList.join(hits, Seq("probe_id"), "left")
          .agg(count(lit(1)).as("n_probes"),
            round(sum(coalesce(col("hits"), lit(0L))) /
              (count(lit(1)) * lit(5.0)), 6).as("recall_at_5"))
          .select(lit(method).as("method"), col("n_probes"),
            col("recall_at_5"))
      }
      val pqAgreement = {
        val w = (c: Column) => Window
          .partitionBy(Guards.constKey(col("vec_id"))).orderBy(c, col("vec_id"))
        q120IvfPq.run(s, d)
          .withColumn("ra", row_number().over(w(col("approx_d"))))
          .withColumn("re", row_number().over(w(col("exact_d"))))
          .where(col("ra") <= 5 && col("re") <= 5)
          .agg(round(count(lit(1)) / lit(5.0), 6).as("recall_at_5"))
          .select(lit("q120_ivf_pq_adc").as("method"),
            lit(1L).as("n_probes"), col("recall_at_5"))
      }
      // The five scorer pipelines are independent, but building each one
      // triggers its own eager driver work (codebook/centroid collects,
      // checkpoints) — constructed sequentially the query was wall ≈
      // summed task time (10.2 s steady, ~0.9 busy cores). Construct them
      // on a small thread pool so those driver actions overlap (opt guide
      // §2.6 — concurrent jobs back-fill each other's stragglers); the
      // union itself is unchanged, so the result is bit-identical.
      val branches = Seq(
        () => recall("q29_ann_lsh", q29AnnLsh.run(s, d)),
        () => recall("q109_ann_multiprobe", q109AnnMultiprobe.run(s, d)),
        () => recall("q81_ivf", q81IvfAnn.run(s, d)),
        () => recall("q147_rp", q147RpAnn.run(s, d)),
        () => pqAgreement)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.traverse(branches)(b => Future(b())),
          scala.concurrent.duration.Duration.Inf)
        .reduce(_ unionByName _)
        .orderBy(col("method"))
    },
    Some {
      def recallSql(method: String, inner: String): String = s"""
        SELECT '$method' AS method,
          CAST(count(*) AS BIGINT) AS n_probes,
          round(sum(coalesce(h.hits, 0)) / (count(*) * 5.0), 6) AS recall_at_5
        FROM probes p LEFT JOIN (
          SELECT r.probe_id, count(*) AS hits
          FROM ($inner) r JOIN truth t
            ON r.probe_id = t.probe_id AND r.neighbor_id = t.neighbor_id
          GROUP BY 1) h USING (probe_id)"""
      s"""WITH truth AS MATERIALIZED (
        SELECT probe_id, neighbor_id FROM (${q26Knn.oracle.get})),
      probes AS (SELECT DISTINCT probe_id FROM truth)
      SELECT * FROM (
      ${recallSql("q29_ann_lsh", q29AnnLsh.oracle.get)}
      UNION ALL
      ${recallSql("q109_ann_multiprobe", q109AnnMultiprobe.oracle.get)}
      UNION ALL
      ${recallSql("q81_ivf", q81IvfAnn.oracle.get)}
      UNION ALL
      ${recallSql("q147_rp", q147RpAnn.oracle.get)}
      UNION ALL
      SELECT 'q120_ivf_pq_adc' AS method, CAST(1 AS BIGINT) AS n_probes,
        round(count(*) / 5.0, 6) AS recall_at_5
      FROM (
        SELECT vec_id,
          row_number() OVER (ORDER BY approx_d, vec_id) AS ra,
          row_number() OVER (ORDER BY exact_d, vec_id) AS re
        FROM (${q120IvfPq.oracle.get}))
      WHERE ra <= 5 AND re <= 5)
      ORDER BY method"""
    })

  /** The production PageRank contract (Graph.pageRankConverged): iterate
    * to an L1 fixed point instead of a pinned round count — what a real
    * crawl ranker runs, since the needed round count depends on the
    * damping factor, not the analyst. The data-dependent stop IS
    * oracle-expressible (r07 verdict item 1): the oracle unrolls all
    * `maxIter` rounds as GATED CTEs ([[pageRankConvergedRoundSql]]) where
    * a converged state passes through unchanged and (iters, delta)
    * freeze — so rank, round count AND stop delta hash-match the Spark
    * loop. GraphClusterPlanSpec additionally pins converged ≡ fixed-round
    * at the same k and the fixed-point property. */
  val q182PagerankTol = Q(
    "q182_pagerank_tol",
    (s, d) => {
      val e = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      // tol picked for the demo's cost envelope: the L1 delta contracts
      // ~×damping per round, so 0.02 stops at round 20 (measured at both
      // sf0.001 and sf0.01) — the stop demonstrably TRIGGERS
      // (iters < maxIter) instead of riding the cap
      graft.graph.Graph.pageRankConverged(e, tol = 0.02, maxIter = 30)
        .where(col("node").startsWith("s"))
        .orderBy(col("rank").desc, col("node"))
        .limit(30)
        .select(col("node"), round(col("rank"), 12).as("rank"),
          col("iters"), col("l1_delta"))
    },
    Some(s"""WITH e AS MATERIALIZED (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
          's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
      m AS (SELECT count(*) AS n FROM nodes),
      cs0 AS MATERIALIZED (
        SELECT nd.node, dg.outdeg, m.n,
          round(CAST(1.0 AS DOUBLE) / m.n, 12) AS rank,
          CAST(NULL AS DOUBLE) AS delta, 0 AS iters, false AS stopped
        FROM nodes nd LEFT JOIN deg dg USING (node) CROSS JOIN m),
      ${(1 to 30).map(pageRankConvergedRoundSql(_, 0.02)).mkString(",\n")}
      SELECT node, rank, CAST(iters AS INT) AS iters,
        round(delta, 12) AS l1_delta
      FROM cs30
      WHERE node LIKE 's%'
      ORDER BY rank DESC, node LIMIT 30"""))

  /** One converged-HITS iteration as gated CTEs — [[hitsRoundSql]]'s two
    * half-steps under the [[pageRankConvergedRoundSql]] fixed-point
    * gating; the round delta is the sum of BOTH score vectors' L1 moves,
    * each an exact-decimal sum of 12-dp addends, added as two doubles
    * exactly like [[graft.graph.Graph.hitsConverged]]'s
    * deltaExpr(hub)+deltaExpr(auth). */
  private def hitsConvergedRoundSql(k: Int, tol: Double): String = {
    val p = s"hs${k - 1}"
    s"""
      har$k AS (
        SELECT e.dst AS node,
          CAST(sum(CAST(round(s.hub, 12) AS DECIMAL(28,12))) AS DOUBLE) AS raw
        FROM $p s JOIN e ON s.node = e.src
        WHERE NOT s.stopped GROUP BY 1),
      hat$k AS (
        SELECT CAST(sum(CAST(round(raw, 12) AS DECIMAL(28,12))) AS DOUBLE) AS tot
        FROM har$k),
      hsa$k AS MATERIALIZED (
        SELECT s.node, s.hub, s.auth AS pauth, s.stopped, s.iters,
          s.delta AS pdelta,
          CASE WHEN s.stopped THEN s.auth
               ELSE round(coalesce(a.raw, 0.0) / t.tot, 12) END AS auth
        FROM $p s LEFT JOIN har$k a USING (node) CROSS JOIN hat$k t),
      hhr$k AS (
        SELECT e.src AS node,
          CAST(sum(CAST(round(s.auth, 12) AS DECIMAL(28,12))) AS DOUBLE) AS raw
        FROM hsa$k s JOIN e ON s.node = e.dst
        WHERE NOT s.stopped GROUP BY 1),
      hht$k AS (
        SELECT CAST(sum(CAST(round(raw, 12) AS DECIMAL(28,12))) AS DOUBLE) AS tot
        FROM hhr$k),
      hsb$k AS MATERIALIZED (
        SELECT s.node, s.stopped, s.iters, s.pdelta, s.auth, s.pauth,
          s.hub AS phub,
          CASE WHEN s.stopped THEN s.hub
               ELSE round(coalesce(h.raw, 0.0) / t.tot, 12) END AS hub
        FROM hsa$k s LEFT JOIN hhr$k h USING (node) CROSS JOIN hht$k t),
      hg$k AS (
        SELECT CAST(sum(CAST(round(abs(hub - phub), 12) AS DECIMAL(28,12))) AS DOUBLE)
             + CAST(sum(CAST(round(abs(auth - pauth), 12) AS DECIMAL(28,12))) AS DOUBLE) AS nd
        FROM hsb$k WHERE NOT stopped),
      hs$k AS MATERIALIZED (
        SELECT node, hub, auth,
          CASE WHEN stopped THEN pdelta ELSE g.nd END AS delta,
          CASE WHEN stopped THEN iters ELSE $k END AS iters,
          stopped OR g.nd < CAST($tol AS DOUBLE) AS stopped
        FROM hsb$k CROSS JOIN hg$k g)"""
  }

  /** Converged HITS (Graph.hitsConverged): the q134 ranker run to its L1
    * fixed point instead of 4 pinned rounds — hub+auth L1 move < tol
    * stops the loop, and the oracle's gated unroll replays rank, round
    * count and stop delta exactly ([[hitsConvergedRoundSql]]). Top 20
    * suppliers by authority with the stop metadata. */
  val q183HitsTol = Q(
    "q183_hits_tol",
    (s, d) => {
      val e = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.graph.Graph.hitsConverged(e, tol = 1e-6, maxIter = 20)
        .orderBy(col("auth").desc, col("node"))
        .limit(20)
        .select(col("node"), round(col("hub"), 12).as("hub"),
          round(col("auth"), 12).as("auth"), col("iters"), col("l1_delta"))
    },
    Some(s"""WITH e AS MATERIALIZED (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
          's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      m AS (SELECT count(*) AS n FROM nodes),
      hs0 AS MATERIALIZED (
        SELECT node, round(CAST(1.0 AS DOUBLE) / m.n, 12) AS hub,
          round(CAST(1.0 AS DOUBLE) / m.n, 12) AS auth,
          CAST(NULL AS DOUBLE) AS delta, 0 AS iters, false AS stopped
        FROM nodes CROSS JOIN m),
      ${(1 to 20).map(hitsConvergedRoundSql(_, 1e-6)).mkString(",\n")}
      SELECT node, round(hub, 12) AS hub, round(auth, 12) AS auth,
        CAST(iters AS INT) AS iters, round(delta, 12) AS l1_delta
      FROM hs20
      ORDER BY auth DESC, node LIMIT 20"""))

  /** One converged-PPR iteration as gated CTEs — [[pprRoundSql]] under
    * the fixed-point gating, teleport/dangling mass routed to the
    * personalization vector. */
  private def pprConvergedRoundSql(k: Int, tol: Double): String = {
    val p = s"qs${k - 1}"
    s"""
      qc$k AS (
        SELECT e.dst AS node,
          CAST(sum(CAST(round(s.rank / s.outdeg, 12) AS DECIMAL(28,12))) AS DOUBLE) AS in_sum
        FROM $p s JOIN e ON s.node = e.src
        WHERE NOT s.stopped GROUP BY 1),
      qd$k AS (
        SELECT coalesce(CAST(sum(CAST(round(rank, 12) AS DECIMAL(28,12))) AS DOUBLE), 0.0) AS mass
        FROM $p WHERE outdeg IS NULL AND NOT stopped),
      qt$k AS MATERIALIZED (
        SELECT s.node, s.outdeg, s.p, s.stopped, s.iters, s.delta AS pdelta,
          s.rank AS prev,
          CASE WHEN s.stopped THEN s.rank
               ELSE round(CAST(0.15 AS DOUBLE) * s.p + CAST(0.85 AS DOUBLE) *
                 (coalesce(c.in_sum, 0.0) + d.mass * s.p), 12) END AS rank
        FROM $p s LEFT JOIN qc$k c USING (node) CROSS JOIN qd$k d),
      qg$k AS (
        SELECT CAST(sum(CAST(round(abs(rank - prev), 12) AS DECIMAL(28,12))) AS DOUBLE) AS nd
        FROM qt$k WHERE NOT stopped),
      qs$k AS MATERIALIZED (
        SELECT node, outdeg, p, rank,
          CASE WHEN stopped THEN pdelta ELSE g.nd END AS delta,
          CASE WHEN stopped THEN iters ELSE $k END AS iters,
          stopped OR g.nd < CAST($tol AS DOUBLE) AS stopped
        FROM qt$k CROSS JOIN qg$k g)"""
  }

  /** Converged personalized PageRank
    * (Graph.personalizedPageRankConverged): q165's seed-proximity ranker
    * run to its L1 fixed point — the production contract for "which
    * suppliers serve these customers", since seed sets change per query
    * and the needed round count with them. Same gated-unroll oracle
    * treatment as q182/q183. */
  val q184PprTol = Q(
    "q184_ppr_tol",
    (s, d) => {
      val e = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      val isSeed = (node: Column) =>
        node.startsWith("c") &&
          expr("CAST(substring(node, 2) AS BIGINT)") % 97 === 0
      // tol/maxIter sized so the stop TRIGGERS: the seed-concentrated
      // init puts the first-round L1 move at 1.7, contracting ×0.85 per
      // round, so tol=0.01 lands near round 33 — well inside the cap
      graft.graph.Graph.personalizedPageRankConverged(e, isSeed,
          tol = 0.01, maxIter = 40)
        .where(col("node").startsWith("s"))
        .orderBy(col("rank").desc, col("node"))
        .limit(30)
        .select(col("node"), round(col("rank"), 12).as("rank"),
          col("iters"), col("l1_delta"))
    },
    Some(s"""WITH e AS MATERIALIZED (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
          's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
      m AS (
        SELECT count(*) AS ns FROM nodes
        WHERE node LIKE 'c%' AND CAST(substring(node, 2) AS BIGINT) % 97 = 0),
      qs0 AS MATERIALIZED (
        SELECT nd.node, dg.outdeg,
          round(CASE WHEN nd.node LIKE 'c%'
                      AND CAST(substring(nd.node, 2) AS BIGINT) % 97 = 0
                THEN CAST(1.0 AS DOUBLE) / m.ns ELSE CAST(0.0 AS DOUBLE) END,
            12) AS p,
          round(CASE WHEN nd.node LIKE 'c%'
                      AND CAST(substring(nd.node, 2) AS BIGINT) % 97 = 0
                THEN CAST(1.0 AS DOUBLE) / m.ns ELSE CAST(0.0 AS DOUBLE) END,
            12) AS rank,
          CAST(NULL AS DOUBLE) AS delta, 0 AS iters, false AS stopped
        FROM nodes nd LEFT JOIN deg dg USING (node) CROSS JOIN m),
      ${(1 to 40).map(pprConvergedRoundSql(_, 0.01)).mkString(",\n")}
      SELECT node, rank, CAST(iters AS INT) AS iters,
        round(delta, 12) AS l1_delta
      FROM qs40
      WHERE node LIKE 's%'
      ORDER BY rank DESC, node LIMIT 30"""))

  /** One converged-Lloyd round as gated CTEs — [[kmeansRoundSql]] under
    * the q182 fixed-point gating. The one-row state (stopped, iters,
    * shift) rides ks$n; a stopped round's assignment CTE is empty, so
    * the COALESCE in kg$n passes the centroids through unchanged and
    * the shift evaluates to 0 — pass-through needs no CASE on the
    * centroid side. The round shift is Σ_{cid,dim} round(|c−c_prev|,6)
    * summed as exact DECIMAL then compared on its DOUBLE image — the
    * identical arithmetic [[graft.operators.Clustering
    * .kmeansAssignConverged]] runs on the driver. */
  private def kmeansConvergedRoundSql(n: Int, tol: Double): String = {
    val p = n - 1
    s"""
      ka$n AS (
        SELECT p.vec_id,
          min(struct_pack(d := round(list_aggregate(list_transform(range(1, 65),
              i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i])), 'sum'), 6),
            c := c.cid)) AS best
        FROM p CROSS JOIN kg$p c CROSS JOIN ks$p s
        WHERE NOT s.stopped GROUP BY p.vec_id),
      km$n AS (
        SELECT a.best.c AS cid, d.i,
          round(CAST(sum(CAST(p.v[d.i] AS DECIMAL(28,12))) AS DOUBLE)
            / count(*), 6) AS x
        FROM ka$n a JOIN p USING (vec_id), (SELECT unnest(range(1, 65)) AS i) d
        GROUP BY 1, 2),
      kg$n AS MATERIALIZED (
        SELECT c.cid, COALESCE(mm.cv, c.cv) AS cv
        FROM kg$p c LEFT JOIN
          (SELECT cid, list(x ORDER BY i) AS cv FROM km$n GROUP BY cid) mm
          ON mm.cid = c.cid),
      kh$n AS (
        SELECT CAST(sum(CAST(round(abs(nw.cv[d.i] - od.cv[d.i]), 6)
            AS DECIMAL(18,6))) AS DOUBLE) AS sh
        FROM kg$n nw JOIN kg$p od ON nw.cid = od.cid,
          (SELECT unnest(range(1, 65)) AS i) d),
      ks$n AS (
        SELECT s.stopped OR h.sh < CAST($tol AS DOUBLE) AS stopped,
          CASE WHEN s.stopped THEN s.iters ELSE $n END AS iters,
          CASE WHEN s.stopped THEN s.shift ELSE h.sh END AS shift
        FROM ks$p s CROSS JOIN kh$n h)"""
  }

  /** Converged k-means (Clustering.kmeansAssignConverged): q93's Lloyd
    * clustering run until the centroids stop moving instead of a pinned
    * 2 rounds — the production contract for the SemDeDup/IVF pre-pass,
    * where the needed round count depends on corpus geometry. The stop
    * is driver arithmetic (centroids already land there every round),
    * and the oracle's gated unroll replays assignment, round count and
    * final shift exactly ([[kmeansConvergedRoundSql]]). */
  val q185KmeansTol = Q(
    "q185_kmeans_tol",
    (s, d) =>
      graft.operators.Clustering.kmeansAssignConverged(
        embeddings(s, d), "vec_id", "embedding", k = 8,
        tol = 0.5, maxIter = 12),
    Some(s"""WITH p AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      k0 AS (SELECT vec_id, v FROM p ORDER BY vec_id LIMIT 8),
      kg0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
        FROM k0),
      ks0 AS (
        SELECT false AS stopped, 0 AS iters, CAST(NULL AS DOUBLE) AS shift),
      ${(1 to 12).map(kmeansConvergedRoundSql(_, 0.5)).mkString(",\n")},
      kfin AS (
        SELECT p.vec_id,
          min(struct_pack(d := round(list_aggregate(list_transform(range(1, 65),
              i -> (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i])), 'sum'), 6),
            c := c.cid)) AS best
        FROM p CROSS JOIN kg12 c GROUP BY p.vec_id)
      SELECT a.vec_id, CAST(a.best.c AS BIGINT) AS cluster,
        CAST(s.iters AS INT) AS iters, round(s.shift, 6) AS shift
      FROM kfin a CROSS JOIN ks12 s"""))

  /** q186's cell-partitioned IVF index, staged ONCE per (process, sfDir)
    * at a Scratch path — the one-time layout is setup, not the probe
    * path under test (the q112/q179 staging discipline). */
  private val q186IndexByDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** IVF ANN over a PERSISTED cell-partitioned index
    * (Similarity.writeIvfIndex / ivfPartitionedTopK): q81's search with
    * the corpus assignment paid once at build time and the probe-time
    * scan pruned to the probed cells — the broadcast probe join on the
    * partition column becomes a dynamic partition-pruning filter on the
    * index scan (IvfLayoutSpec asserts it), so search I/O tracks cell
    * population, not corpus size. Same candidates, same ranks as q81 —
    * the oracle is shared, which is itself the proof that the layout
    * changed the I/O shape and nothing else. */
  val q186IvfPartitioned = Q(
    "q186_ivf_partitioned",
    (s, d) => {
      val e = embeddings(s, d)
      val cent = Clustering.labelCentroids(e, "label", "embedding")
      val tag = d.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9_]", "_")
      val path = q186IndexByDir.computeIfAbsent(d, _ => {
        val p = graft.sources.Scratch.dir(s"ivfidx_$tag")
        graft.operators.Similarity.writeIvfIndex(
          e, "vec_id", "embedding", cent, p)
        p
      })
      graft.operators.Similarity.ivfPartitionedTopK(
        e.where(col("vec_id") < 10), "vec_id", "embedding", cent, path,
        k = 5, nprobe = 2)
    },
    q81IvfAnn.oracle)

  /** q187's partitioned base table (orders partitioned by order year),
    * staged ONCE per (process, sfDir). The MERGE itself runs inside the
    * query body every invocation — it is idempotent for the fixed
    * changeset (the final state is a pure function of (base, changes)),
    * so repetition is safe and each bench iteration measures a real
    * bounded-footprint merge, not a staging artifact. */
  private val q187BaseByDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Keyed MERGE into a partitioned fact table
    * (Sinks.mergeIntoPartitioned) — the incremental-ingest pattern: a
    * changeset confined to order-year 1997 (price restatements on
    * key%7, cancellations on key%11, 400-day reschedules on key%13 —
    * the last MOVING rows into the next partition) applies as
    * upsert/delete/move while rewriting only the touched year
    * partitions; every other year's files are untouched (MergeSpec pins
    * the no-rewrite guarantee, emptied-partition cleanup and
    * idempotency). The oracle replays the merge relationally from
    * (orders, changes) — the readback census matching proves the
    * partial rewrite reconstructed exactly the state a full rebuild
    * would have. */
  val q187MergeUpsert = Q(
    "q187_merge_upsert",
    (s, d) => {
      val tag = d.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9_]", "_")
      val path = q187BaseByDir.computeIfAbsent(d, _ => {
        val p = graft.sources.Scratch.dir(s"merge_$tag")
        graft.sources.Sinks.writePartitioned(
          orders(s, d).withColumn("o_year", year(col("o_orderdate"))),
          p, Seq("o_year"))
        p
      })
      val k = col("o_orderkey")
      val changes = orders(s, d)
        .where(year(col("o_orderdate")) === 1997 &&
          (k % 7 === 0 || k % 11 === 0 || k % 13 === 0))
        .withColumn("o_orderdate",
          when(k % 13 === 0, col("o_orderdate") + expr("INTERVAL 400 DAYS"))
            .otherwise(col("o_orderdate")))
        .withColumn("o_totalprice",
          when(k % 7 === 0, round(col("o_totalprice") * 1.1, 2))
            .otherwise(col("o_totalprice")))
        .withColumn("o_year", year(col("o_orderdate")))
        .withColumn("del", k % 11 === 0)
      graft.sources.Sinks.mergeIntoPartitioned(
        path, changes, Seq("o_orderkey"), Seq("o_year"),
        deleteCol = Some("del"))
      s.read.parquet(path)
        .groupBy(col("o_year").cast("int").as("o_year"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice"), 2).cast("decimal(28,2)"))
            .cast("double").as("total"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_year"))
    },
    Some("""WITH ch AS (
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 13 = 0
               THEN o_orderdate + INTERVAL 400 DAY
               ELSE o_orderdate END AS od,
          CASE WHEN o_orderkey % 7 = 0
               THEN round(o_totalprice * CAST(1.1 AS DOUBLE), 2)
               ELSE o_totalprice END AS p,
          o_orderkey % 11 = 0 AS del
        FROM orders
        WHERE year(o_orderdate) = 1997 AND
          (o_orderkey % 7 = 0 OR o_orderkey % 11 = 0 OR o_orderkey % 13 = 0)),
      fin AS (
        SELECT year(o_orderdate) AS y, o_totalprice AS p, o_orderkey AS k
        FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ch)
        UNION ALL
        SELECT year(od), p, o_orderkey FROM ch WHERE NOT del)
      SELECT CAST(y AS INT) AS o_year, count(*) AS n,
        CAST(sum(CAST(round(p, 2) AS DECIMAL(28,2))) AS DOUBLE) AS total,
        min(k) AS min_key, max(k) AS max_key
      FROM fin GROUP BY 1 ORDER BY 1"""))

  /** One synchronous-LPA iteration as gated CTEs — votes (neighbor
    * labels + the self-vote), integer count argmax with ties to the
    * smallest label, change census, all under the q182 fixed-point
    * gating. A stopped round's empty winner CTE makes label pass-through
    * automatic via COALESCE (the self-vote guarantees every node a
    * winner row in live rounds). */
  private def lpaRoundSql(k: Int): String = {
    val p = k - 1
    s"""
      lv$k AS (
        SELECT e.b AS node, s.lab
        FROM ls$p s JOIN und e ON s.node = e.a
          CROSS JOIN lt$p t WHERE NOT t.stopped
        UNION ALL
        SELECT s.node, s.lab FROM ls$p s
          CROSS JOIN lt$p t WHERE NOT t.stopped),
      lc$k AS (SELECT node, lab, count(*) AS cnt FROM lv$k GROUP BY 1, 2),
      lw$k AS (
        SELECT node, lab AS newlab FROM (
          SELECT node, lab, row_number() OVER (
            PARTITION BY node ORDER BY cnt DESC, lab) AS rn
          FROM lc$k) WHERE rn = 1),
      lh$k AS MATERIALIZED (
        SELECT CAST(count(*) AS DOUBLE) AS ch
        FROM ls$p s JOIN lw$k w USING (node) WHERE w.newlab <> s.lab),
      ls$k AS MATERIALIZED (
        SELECT s.node, COALESCE(w.newlab, s.lab) AS lab
        FROM ls$p s LEFT JOIN lw$k w USING (node)),
      lt$k AS MATERIALIZED (
        SELECT t.stopped OR h.ch = 0 AS stopped,
          CASE WHEN t.stopped THEN t.iters ELSE $k END AS iters,
          CASE WHEN t.stopped THEN t.changed ELSE h.ch END AS changed
        FROM lt$p t CROSS JOIN lh$k h)"""
  }

  /** Community detection on the co-supply graph
    * (Graph.labelPropagationConverged): suppliers are linked when they
    * co-supplied more orders than the average co-supplying pair (the
    * threshold is a one-row broadcast, so the graph build is two
    * integer aggregations), then synchronous self-vote LPA runs to the
    * zero-change fixed point. The pair fan-out is bounded by order size
    * squared (the q146 market-basket shape), never supplier². Oracle:
    * the same thresholded graph, then [[lpaRoundSql]]'s gated unroll —
    * labels, round count and the stop's change census all hash-match. */
  /** The thresholded supplier co-supply graph q188/q212 run on:
    * suppliers linked when they co-supplied more orders than the
    * average co-supplying pair (one-row broadcast threshold; pair
    * fan-out bounded by order size squared — the q146 basket shape,
    * never supplier²). Edges come out canonical (src < dst). */
  private def coSupplyEdges(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .select(col("l_orderkey").as("ok"),
        concat(lit("s"), col("l_suppkey")).as("sup"))
      .distinct()
    val pairs = li
      .join(li.withColumnRenamed("sup", "sup2"), "ok")
      .where(col("sup") < col("sup2"))
      .groupBy(col("sup").as("src"), col("sup2").as("dst"))
      .agg(count(lit(1)).as("co"))
    val thr = pairs.agg(avg(col("co")).as("m"))
      .withColumn("__k", graft.operators.Guards.constKey(col("m")))
    pairs
      .withColumn("__k", graft.operators.Guards.constKey(col("src")))
      .join(broadcast(thr), "__k")
      .where(col("co") > col("m"))
      .select(col("src"), col("dst"))
  }

  val q188LpaTol = Q(
    "q188_lpa_tol",
    (s, d) =>
      graft.graph.Graph
        .labelPropagationConverged(coSupplyEdges(s, d), maxIter = 10)
        .orderBy(col("node")),
    Some(s"""WITH li AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS ok,
          's' || CAST(l_suppkey AS VARCHAR) AS sup
        FROM lineitem),
      pr AS (
        SELECT x.sup AS s1, y.sup AS s2, count(*) AS co
        FROM li x JOIN li y ON x.ok = y.ok AND x.sup < y.sup
        GROUP BY 1, 2),
      thr AS (SELECT avg(co) AS m FROM pr),
      ed AS (SELECT s1, s2 FROM pr, thr WHERE co > m),
      und AS MATERIALIZED (
        SELECT s1 AS a, s2 AS b FROM ed UNION SELECT s2, s1 FROM ed),
      ls0 AS MATERIALIZED (
        SELECT DISTINCT a AS node, a AS lab FROM und),
      lt0 AS (
        SELECT false AS stopped, 0 AS iters, CAST(NULL AS DOUBLE) AS changed),
      ${(1 to 10).map(lpaRoundSql).mkString(",\n")}
      SELECT s.node, s.lab AS label, CAST(t.iters AS INT) AS iters,
        CAST(t.changed AS BIGINT) AS changed
      FROM ls10 s CROSS JOIN lt10 t
      ORDER BY s.node"""))

  /** q189's deliberately fragmented table (orders partitioned by year,
    * 8 hash-salted files per partition — the state a streaming append
    * or per-executor writer leaves behind), staged ONCE per (process,
    * sfDir) with its pre-compaction file census remembered so the
    * fragmentation evidence survives the compaction the query then
    * performs. */
  private val q189TableByDir =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Int)]()

  /** Small-file compaction (Sinks.compactPartitions) as a catalog
    * operator: compact the fragmented table, then emit the per-year
    * content census PLUS two driver-verified layout booleans —
    * fragmented_before (the staged table really had multi-file
    * partitions) and compacted_after (every partition now at one file).
    * The booleans ride the hash gate (the q53 driver-checkable-bounds
    * pattern: the oracle expects literal true), and the census matching
    * the raw orders table proves content invariance — compaction
    * changed the LAYOUT and nothing else. Re-invocations no-op (a
    * compacted partition is at its target), so bench steady state
    * measures the census read, which is the honest cost of an
    * already-maintained table. */
  val q189Compaction = Q(
    "q189_compaction",
    (s, d) => {
      val tag = d.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9_]", "_")
      val staged = q189TableByDir.computeIfAbsent(d, _ => {
        val p = graft.sources.Scratch.dir(s"compact_$tag")
        orders(s, d)
          .withColumn("o_year", year(col("o_orderdate")))
          .withColumn("__frag", pmod(xxhash64(col("o_orderkey")), lit(8)))
          // explicit partition count: a bare repartition(cols) is AQE-
          // coalesced on this data size and the "fragmented" fixture
          // lands at one file per partition, staging nothing to compact
          .repartition(64, col("o_year"), col("__frag"))
          .drop("__frag")
          .write.mode("overwrite").partitionBy("o_year").parquet(p)
        val bm = graft.sources.Sinks.partitionFileStats(p, Seq("o_year"))
          .map(_._2).max
        (p, bm)
      })
      val (path, beforeMax) = staged
      graft.sources.Sinks.compactPartitions(s, path, Seq("o_year"))
      val afterMax = graft.sources.Sinks.partitionFileStats(path, Seq("o_year"))
        .map(_._2).max
      s.read.parquet(path)
        .groupBy(col("o_year").cast("int").as("o_year"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice"), 2).cast("decimal(28,2)"))
            .cast("double").as("total"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .withColumn("fragmented_before", lit(beforeMax > 1))
        .withColumn("compacted_after", lit(afterMax == 1))
        .orderBy(col("o_year"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        count(*) AS n,
        CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(28,2))) AS DOUBLE) AS total,
        min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        true AS fragmented_before, true AS compacted_after
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** The parts co-purchase graph both graph-topology queries below run
    * on: parts are linked when some order contains both (the q146 basket
    * fan-out, bounded by order size squared), distinct, a < b. Dense
    * enough to have real topology (avg degree ~120 at sf0.1) while the
    * per-order pair explosion stays O(|order|²). */
  private def coOrderEdges(s: SparkSession, d: String): DataFrame = {
    val l1 = lineitem(s, d).select(col("l_orderkey").as("ok"),
      col("l_partkey").as("a"))
    val l2 = lineitem(s, d).select(col("l_orderkey").as("ok"),
      col("l_partkey").as("b"))
    l1.join(l2, Seq("ok")).where(col("a") < col("b"))
      .select(col("a").as("src"), col("b").as("dst")).distinct()
  }

  private val coOrderEdgesSql = """
      e AS MATERIALIZED (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey < l2.l_partkey),
      und AS MATERIALIZED (
        SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e)"""

  /** Exact triangle census of the co-purchase graph — the local-density
    * topology audit (a node's triangle count separates genuinely
    * clustered co-occurrence from hub-and-spoke noise; triangles also
    * feed clustering coefficients and community seeds). Scale shape is
    * the whole point — see [[graft.graph.Graph.triangleCount]]: degree-
    * ordered orientation caps wedge volume at Σ outdeg² ≤ m^1.5 (41M
    * wedges → 1.9M triangles at sf0.1) where the unoriented join's
    * Σ deg² dies on the first celebrity node. Top 30 parts by triangle
    * membership, count-desc. The oracle replays the identical
    * orientation and wedge-closure joins. */
  val q190TriangleCount = Q(
    "q190_triangle_count",
    (s, d) =>
      graft.graph.Graph.triangleCount(coOrderEdges(s, d))
        .orderBy(col("triangles").desc, col("node"))
        .limit(30),
    Some(s"""WITH $coOrderEdgesSql,
      deg AS (SELECT a AS node, count(*) AS d FROM und GROUP BY 1),
      o AS MATERIALIZED (
        SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
               CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v,
               CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS dv
        FROM (SELECT e.a, e.b, d1.d AS da, d2.d AS db
              FROM e JOIN deg d1 ON e.a = d1.node
                     JOIN deg d2 ON e.b = d2.node)),
      w AS (
        SELECT e1.u, e1.v AS x, e2.v AS y
        FROM o e1 JOIN o e2 ON e1.u = e2.u
          AND (e1.dv < e2.dv OR (e1.dv = e2.dv AND e1.v < e2.v))),
      tri AS (SELECT w.u, w.x, w.y FROM w JOIN o ON w.x = o.u AND w.y = o.v),
      credit AS (
        SELECT u AS node FROM tri
        UNION ALL SELECT x FROM tri
        UNION ALL SELECT y FROM tri)
      SELECT node, count(*) AS triangles FROM credit GROUP BY 1
      ORDER BY triangles DESC, node LIMIT 30"""))

  /** k-core membership of the co-purchase graph — graph-topology quality
    * gating ([[graft.graph.Graph.kCore]]): coreness keeps the densely-
    * embedded subgraph and peels connected-but-peripheral nodes that raw
    * degree cut-offs misjudge. k is sized FROM the graph as
    * ceil(0.65 · avg degree) in exact integer arithmetic
    * ((13·S + 20·N − 1) div (20·N), S = Σdeg, N = nodes — float-free, so
    * both engines compute the identical k at every scale; measured peel
    * depth 1/3/5 rounds at sf0.001/0.01/0.1, cores all non-empty).
    * Synchronous peeling is monotone, so the oracle unrolls maxIter
    * rounds UNGATED — a converged round recomputes the same live set —
    * and `iters` (the probe-transport round count, peel depth + 1)
    * falls out as 1 + the number of strictly-shrinking rounds. */
  val q191Kcore = Q(
    "q191_kcore",
    (s, d) => {
      // the basket self-join + distinct is read by the k-sizing aggregate
      // AND re-read inside kCore's own und build — cut it once
      val e = coOrderEdges(s, d).localCheckpoint()
      val und = e.select(col("src").as("a"), col("dst").as("b"))
        .unionByName(e.select(col("dst").as("a"), col("src").as("b")))
      // one bounded driver action to size k (two integers), like the
      // config-scale centroid collects
      val row = und.agg(count(lit(1)).as("s"),
        countDistinct(col("a")).as("n")).head()
      val (sDeg, n) = (row.getLong(0), row.getLong(1))
      val k = ((13L * sDeg + 20L * n - 1L) / (20L * n)).toInt
      graft.graph.Graph.kCore(e, k, maxIter = 12)
        .orderBy(col("node"))
    },
    Some {
      val maxIter = 12
      val rounds = (1 to maxIter).map { r =>
        s"""a$r AS MATERIALIZED (
          SELECT d.node FROM (
            SELECT u.a AS node, count(*) AS deg FROM und u
            JOIN a${r - 1} x ON u.a = x.node
            JOIN a${r - 1} y ON u.b = y.node
            GROUP BY 1) d, kk
          WHERE d.deg >= kk.k)"""
      }.mkString(",\n      ")
      val shrink = (1 to maxIter).map { r =>
        s"(CAST((SELECT count(*) FROM a${r - 1}) > (SELECT count(*) FROM a$r) AS INT))"
      }.mkString(" + ")
      s"""WITH $coOrderEdgesSql,
      kk AS MATERIALIZED (
        SELECT (13 * count(*) + 20 * count(DISTINCT a) - 1)
                 // (20 * count(DISTINCT a)) AS k
        FROM und),
      a0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM und),
      $rounds,
      it AS (SELECT CAST(1 + $shrink AS INT) AS iters)
      SELECT d.node, d.core_deg, it.iters
      FROM (SELECT u.a AS node, count(*) AS core_deg FROM und u
            JOIN a$maxIter x ON u.a = x.node
            JOIN a$maxIter y ON u.b = y.node
            GROUP BY 1) d, it
      ORDER BY node"""
    })

  /** Weighted single-source shortest paths over the co-purchase graph
    * ([[graft.graph.Graph.sssp]]) — "how far is every part from the
    * anchor assortment": seeds are every 50th part, edge cost rewards
    * frequent co-purchase (w = 1/4/13 for ≥3 / 2 / 1 shared orders —
    * the spread makes chains through strongly-associated pairs
    * genuinely beat one rare-pair hop, so the relaxation runs
    * multi-hop instead of degenerating to a 1-hop census), and the
    * output is the reachability census per distance (node count + id
    * envelope per dist bucket — bounded rows, but every node's exact
    * distance feeds the hash through min/max/count). All arithmetic is
    * BIGINT, the relaxation is monotone, and the stop is probed — the
    * oracle unrolls maxIter rounds UNGATED (a converged round
    * recomputes the same state, the q191 treatment) with
    * iters = 1 + state-changing transitions. Measured fixpoint depth
    * (iters) 5/6/5 at sf0.001/0.01/0.1, inside the 12-round cap. */
  /** Weighted co-purchase edges shared by q192/q194: cost 1/4/13 for
    * ≥3 / 2 / 1 shared orders (both directions). */
  private def coOrderWeighted(s: SparkSession, d: String): DataFrame = {
    val l1 = lineitem(s, d).select(col("l_orderkey").as("ok"),
      col("l_partkey").as("a"))
    val l2 = lineitem(s, d).select(col("l_orderkey").as("ok"),
      col("l_partkey").as("b"))
    val pair = l1.join(l2, Seq("ok")).where(col("a") < col("b"))
      .select("ok", "a", "b").distinct()
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
    val w = when(col("shared") >= 3, lit(1L))
      .when(col("shared") === 2, lit(4L)).otherwise(lit(13L))
    pair.select(col("a").as("src"), col("b").as("dst"), w.as("w"))
      .unionByName(
        pair.select(col("b").as("src"), col("a").as("dst"), w.as("w")))
  }

  private val coOrderWeightedSql = """pair AS MATERIALIZED (
        SELECT l1.l_partkey AS a, l2.l_partkey AS b,
               count(DISTINCT l1.l_orderkey) AS shared
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey < l2.l_partkey
        GROUP BY 1, 2),
      we AS MATERIALIZED (
        SELECT a AS src, b AS dst,
          CASE WHEN shared >= 3 THEN 1 WHEN shared = 2 THEN 4
               ELSE 13 END AS w FROM pair
        UNION ALL
        SELECT b, a,
          CASE WHEN shared >= 3 THEN 1 WHEN shared = 2 THEN 4
               ELSE 13 END FROM pair)"""

  val q192Sssp = Q(
    "q192_sssp",
    (s, d) => {
      graft.graph.Graph.sssp(coOrderWeighted(s, d), n => n % 50 === 0,
          maxIter = 12)
        .groupBy("dist")
        .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"),
          max("node").as("max_node"), max("iters").as("iters"))
        .orderBy("dist")
    },
    Some {
      val maxIter = 12
      val rounds = (1 to maxIter).map { r =>
        s"""s$r AS MATERIALIZED (
          SELECT node, min(dist) AS dist, min(prev) AS prev FROM (
            SELECT node, dist, dist AS prev FROM s${r - 1}
            UNION ALL
            SELECT ed.dst AS node, s.dist + ed.w AS dist,
                   CAST(NULL AS BIGINT) AS prev
            FROM s${r - 1} s JOIN we ed ON s.node = ed.src) GROUP BY node)"""
      }.mkString(",\n      ")
      val changed = (1 to maxIter).map { r =>
        s"(CAST(EXISTS(SELECT 1 FROM s$r WHERE prev IS NULL OR dist < prev) AS INT))"
      }.mkString(" + ")
      s"""WITH $coOrderWeightedSql,
      s0 AS MATERIALIZED (
        SELECT node, CAST(0 AS BIGINT) AS dist, CAST(NULL AS BIGINT) AS prev
        FROM (SELECT DISTINCT src AS node FROM we)
        WHERE node % 50 = 0),
      $rounds,
      it AS (SELECT CAST(1 + $changed AS INT) AS iters)
      SELECT dist, count(*) AS n_nodes, min(node) AS min_node,
             max(node) AS max_node, it.iters
      FROM s$maxIter, it
      GROUP BY dist, it.iters
      ORDER BY dist"""
    })

  /** Incremental component maintenance — the daily-crawl shape end to
    * end ([[graft.operators.Dedup.incrementalComponents]]): yesterday's
    * corpus (doc_id % 7 ≠ 0) is clustered once; today's docs arrive and
    * ONLY the changeset-bounded subgraph is touched — endpoint label
    * lookup, contracted-graph CC at changeset scale, broadcast
    * relabel — never the old pair set. LSH candidate pairs are per-pair
    * independent, so splitting the full corpus's pairs by endpoint
    * epoch IS the realistic flow: old×old pairs are exactly what
    * yesterday's run produced, the rest is what
    * [[graft.operators.Dedup.incrementalNearDup]] generates today.
    * The oracle is q78's FULL-recompute recursive CTE over the union
    * graph, shipped verbatim — the strongest possible statement that
    * the incremental fold changes the work bound, not the answer. */
  val q193IncrementalComponents = Q(
    "q193_incremental_components",
    (s, d) => {
      // read twice (old/new split) — cut so minhash+banding runs once
      val pairs = Dedup.minHashLshPairs(documents(s, d), "doc_id", "text",
        n = 3, numHashes = 32, numBands = 8, threshold = 0.5)
        .localCheckpoint()
      val old = (c: Column) => c % 7 =!= 0
      val oldPairs = pairs.where(old(col("id1")) && old(col("id2")))
      val newPairs = pairs.where(!(old(col("id1")) && old(col("id2"))))
      val labels = Dedup.connectedComponents(oldPairs)
      Dedup.incrementalComponents(labels, newPairs)
        .select(col("id").as("doc_id"), col("component").as("canonical_id"))
    },
    Some(minhashPairsSql +
      """,
      p AS (
        SELECT id1, id2 FROM cand
        WHERE len(list_filter(range(1, 33), i -> m1[i] = m2[i])) / 32.0 >= 0.5),
      e AS (SELECT id1 AS u, id2 AS v FROM p
            UNION SELECT id2, id1 FROM p),
      reach(u, v) AS (
        SELECT u, u FROM e
        UNION
        SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u)
      SELECT u AS doc_id, min(v) AS canonical_id
      FROM reach GROUP BY u"""))

  /** Sampled closeness centrality (Eppstein & Wang 2004: estimate
    * centrality from k sampled sources) over the weighted co-purchase
    * graph — [[graft.graph.Graph.ssspPerSeed]] runs every sampled
    * seed's Bellman–Ford frontier in the SAME rounds (state keyed
    * (seed, node), so k seeds cost k× state, not k× rounds), and the
    * per-seed closeness summary falls out of one groupBy: reach count,
    * exact total distance (the inverse-closeness numerator), and
    * eccentricity-within-reach. Seeds every 97th part BELOW 2000 —
    * Eppstein–Wang is exactly the regime where the sample stays FIXED
    * as the graph grows (k ~ log n / eps^2 sources), so the seed set is
    * size-bounded by construction (3/21/21 at the three SFs) and the
    * per-round relax volume tracks k·|E|, not |V|·|E|. All BIGINT; same
    * ungated-unroll oracle as q192 with the seed riding the CTE key.
    * Measured iters 7/10/12, cap 16. */
  val q194Closeness = Q(
    "q194_closeness",
    (s, d) => {
      graft.graph.Graph.ssspPerSeed(coOrderWeighted(s, d),
          n => n % 97 === 0 && n < 2000, maxIter = 16)
        .groupBy("seed")
        .agg(count(lit(1)).as("n_reached"),
          sum("dist").as("total_dist"),
          max("dist").as("eccentricity"),
          max("iters").as("iters"))
        .orderBy("seed")
    },
    Some {
      val maxIter = 16
      val rounds = (1 to maxIter).map { r =>
        s"""c$r AS MATERIALIZED (
          SELECT seed, node, min(dist) AS dist, min(prev) AS prev FROM (
            SELECT seed, node, dist, dist AS prev FROM c${r - 1}
            UNION ALL
            SELECT s.seed, ed.dst AS node, s.dist + ed.w AS dist,
                   CAST(NULL AS BIGINT) AS prev
            FROM c${r - 1} s JOIN we ed ON s.node = ed.src)
          GROUP BY seed, node)"""
      }.mkString(",\n      ")
      val changed = (1 to maxIter).map { r =>
        s"(CAST(EXISTS(SELECT 1 FROM c$r WHERE prev IS NULL OR dist < prev) AS INT))"
      }.mkString(" + ")
      s"""WITH $coOrderWeightedSql,
      c0 AS MATERIALIZED (
        SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist,
               CAST(NULL AS BIGINT) AS prev
        FROM (SELECT DISTINCT src AS node FROM we)
        WHERE node % 97 = 0 AND node < 2000),
      $rounds,
      it AS (SELECT CAST(1 + $changed AS INT) AS iters)
      SELECT seed, count(*) AS n_reached,
             CAST(sum(dist) AS BIGINT) AS total_dist,
             max(dist) AS eccentricity, it.iters
      FROM c$maxIter, it
      GROUP BY seed, it.iters
      ORDER BY seed"""
    })

  /** Dominant principal component of the embedding corpus
    * ([[graft.operators.Pca]]) — the embedding-health readout: PC1's
    * loadings plus its explained-variance share of trace(C) flag a
    * collapsed embedding space (templated/duplicated content piles
    * variance onto one direction). One corpus pass accumulates the
    * 64×64 covariance (flatten + row-id self-join, map-side partial
    * agg to 4096 groups — the shuffle carries O(dims²) rows per
    * partition at any corpus size); 12 power-iteration rounds run on
    * dims-scale frames under the decimal(38,12)
    * round-sum-round regime, so the oracle replays covariance AND the
    * full matvec/normalize recurrence as CTEs and hash-matches every
    * loading on the 6-dp state grid. Fixed rounds from the exact-6-dp
    * distinct start (1000+i)/8000 (the q123 fixed-iteration
    * treatment — the round count IS the spec; see Pca.scala on why a
    * uniform start is a cross-engine rounding trap). */
  private def oSum12(x: String) =
    s"round(CAST(sum(CAST(round($x, 12) AS DECIMAL(38,12))) AS DOUBLE), 12)"
  // corpus-scale twin: exact fixed-point long sum, descaled
  private def oSumF(x: String) =
    s"CAST(sum(CAST(round(($x) * 1e12, 0) AS BIGINT)) AS DOUBLE) / 1e12"

  /** The PCA recurrence as oracle CTEs, through `v$rounds` (the final
    * unit loadings) — shared by q195 (loadings readout) and q196
    * (projection rollup). Mirrors [[graft.operators.Pca]] clause for
    * clause. */
  private def pcaCtes(rounds: Int): String = {
    val iter = (1 to rounds).map { r =>
      s"""w$r AS MATERIALIZED (
          SELECT f.i, round(${oSum12("f.c * v.val")}, 6) AS w
          FROM cv f JOIN v${r - 1} v ON f.j = v.i GROUP BY f.i),
        n$r AS MATERIALIZED (
          SELECT round(sqrt(${oSum12("w * w")}), 6) AS nm FROM w$r),
        v$r AS MATERIALIZED (
          SELECT i, round(w / nm, 6) AS val FROM w$r, n$r)"""
    }.mkString(",\n      ")
    s"""vecs AS (
        SELECT embedding FROM embeddings WHERE len(embedding) = 64),
      mu AS MATERIALIZED (
        SELECT i, round(${oSumF("CAST(embedding[i] AS DOUBLE)")}
                          / count(*), 6) AS mu
        FROM vecs, generate_series(1, 64) g(i) GROUP BY i),
      gram AS MATERIALIZED (
        SELECT i, j,
          round(${oSumF(
            "CAST(embedding[i] AS DOUBLE) * CAST(embedding[j] AS DOUBLE)")}
                  / count(*), 6) AS g
        FROM vecs, generate_series(1, 64) g1(i), generate_series(1, 64) g2(j)
        GROUP BY i, j),
      cv AS MATERIALIZED (
        SELECT gram.i, gram.j,
               round(g - round(m1.mu * m2.mu, 12), 6) AS c
        FROM gram JOIN mu m1 ON gram.i = m1.i JOIN mu m2 ON gram.j = m2.i),
      v0 AS (SELECT i, round((1000 + i) / CAST(8000 AS DOUBLE), 6) AS val
             FROM generate_series(1, 64) g(i)),
      $iter"""
  }

  val q195PcaPower = Q(
    "q195_pca_power",
    (s, d) => {
      val cov = graft.operators.Pca.covariance(embeddings(s, d),
        "embedding", dims = 64)
      graft.operators.Pca.powerIteration(cov, dims = 64, rounds = 12)
        .orderBy("dim")
    },
    Some {
      val rounds = 12
      s"""WITH ${pcaCtes(rounds)},
      wf AS MATERIALIZED (
        SELECT f.i, round(${oSum12("f.c * v.val")}, 6) AS w
        FROM cv f JOIN v$rounds v ON f.j = v.i GROUP BY f.i),
      lam AS (SELECT round(${oSum12("v.val * wf.w")}, 12) AS eigenvalue
              FROM v$rounds v JOIN wf ON v.i = wf.i),
      trc AS (SELECT round(${oSum12("c")}, 12) AS trace FROM cv WHERE i = j)
      SELECT v.i AS dim, v.val AS loading, lam.eigenvalue,
             round(lam.eigenvalue / trc.trace, 6) AS explained_ratio
      FROM v$rounds v, lam, trc
      ORDER BY dim"""
    })

  /** PC1 projection rollup by label — PCA in USE: every embedding
    * scored against the dominant component from q195's recurrence
    * (the collect is 64 doubles — config-scale, the centroid/codebook
    * precedent), then a per-label distribution readout (count, mean,
    * min, max of the 6-dp score). The scoring pass is MAP-ONLY — a
    * zip_with/aggregate fold against the literal loading vector, no
    * shuffle until the label rollup's bounded groupBy — so at corpus
    * scale this is one pass + a dims-bounded aggregate. Mean rides the
    * fixed-point long sum (scores are 6-dp, so ×1e12 is exact). The
    * oracle replays the full recurrence (shared CTEs) and the
    * projection; Spark folds the dot product in array order while the
    * oracle sums per-dim rows — a ≤1e-16 association difference
    * attenuated far below the 6-dp output grid. */
  val q196PcaProject = Q(
    "q196_pca_project",
    (s, d) => {
      val cov = graft.operators.Pca.covariance(embeddings(s, d),
        "embedding", dims = 64)
      val pc = graft.operators.Pca.powerIteration(cov, dims = 64,
          rounds = 12)
        .orderBy("dim").collect()
      val loadings = pc.map(_.getDouble(1)).toIndexedSeq
      graft.operators.Pca.project(embeddings(s, d), "embedding", loadings)
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("score") * lit(1e12), 0).cast("long"))
            .cast("double") / lit(1e12) / count(lit(1)), 6).as("mean_score"),
          min("score").as("min_score"), max("score").as("max_score"))
        .orderBy("label")
    },
    Some {
      val rounds = 12
      s"""WITH ${pcaCtes(rounds)},
      proj AS MATERIALIZED (
        SELECT e.vec_id, e.label,
               round(sum(CAST(e.embedding[g.i] AS DOUBLE) * v.val), 6) AS score
        FROM embeddings e, generate_series(1, 64) g(i)
        JOIN v$rounds v ON v.i = g.i
        WHERE len(e.embedding) = 64
        GROUP BY e.vec_id, e.label)
      SELECT label, count(*) AS n,
             round(${oSumF("score")} / count(*), 6) AS mean_score,
             min(score) AS min_score, max(score) AS max_score
      FROM proj
      GROUP BY label
      ORDER BY label"""
    })

  /** The q197 feature frame, Spark side — text-shape features on the
    * 6-dp grid plus the curated-source label, mirrored word for word by
    * [[logregFeaturesSql]]. Guards (coalesce on text / n_chars) are
    * engine-portable; every division re-grids at 6 dp. Takes any frame
    * with (text, n_chars, source) — the bench's sf1 probe feeds it the
    * 10× corpus. */
  private[graft] def logregFeaturesOf(docs: DataFrame): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    val nc = coalesce(col("n_chars"), lit(0L))
    val tok = size(split(t, " ", -1))
    val lt = length(t)
    docs.select(
      when(col("source") === "src0", lit(1.0)).otherwise(lit(0.0)).as("y"),
      lit(1.0).as("x1"),
      round(log(nc + lit(1L)) / lit(10.0), 6).as("x2"),
      round(tok / lit(100.0), 6).as("x3"),
      round(nc / (lit(10.0) * tok), 6).as("x4"),
      round((lt - length(regexp_replace(t, "e", ""))) /
        greatest(lt, lit(1)), 6).as("x5"))
  }

  private val logregFeaturesSql = """f AS MATERIALIZED (
        SELECT CASE WHEN source = 'src0' THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS y,
          CAST(1.0 AS DOUBLE) AS x1,
          round(ln(coalesce(n_chars, 0) + 1) / 10.0, 6) AS x2,
          round(len(string_split(coalesce(text, ''), ' ')) / 100.0, 6) AS x3,
          round(coalesce(n_chars, 0)
            / (10.0 * len(string_split(coalesce(text, ''), ' '))), 6) AS x4,
          round((length(coalesce(text, ''))
              - length(replace(coalesce(text, ''), 'e', '')))
            / greatest(length(coalesce(text, '')), 1), 6) AS x5
        FROM documents)"""

  /** One full-batch GD round as oracle CTEs — [[graft.operators.LogReg
    * .train]] clause for clause: score with round r−1's weights (the
    * identical left-associated dot-product chain), fixed-point-exact
    * gradient and loss sums, and the gradient mean rounded at FIVE
    * decimals so the lr = 0.5 step is an exact 6-dp decimal and the
    * weight update lands ON the grid — never on its half-boundary
    * (LogReg.train on why 6-dp gradients are a systematic cross-engine
    * tie). The round count is a hyperparameter, so the unroll is
    * UNGATED (the q123 fixed-iteration treatment — no fixed-point
    * pass-through needed). */
  private def logregRoundSql(r: Int): String = {
    val p = r - 1
    val dot = (1 to 5).map(i => s"w.w$i*f.x$i").mkString(" + ")
    val sc = "greatest(least(s, CAST(0.999999 AS DOUBLE)), " +
      "CAST(0.000001 AS DOUBLE))"
    s"""
      z$r AS (
        SELECT f.y, ${(1 to 5).map(i => s"f.x$i").mkString(", ")},
          round(1.0/(1.0 + exp(-round($dot, 6))), 6) AS s
        FROM f CROSS JOIN w$p w),
      g$r AS (
        SELECT ${(1 to 5).map(i =>
            s"${oSumF(s"(s - y) * x$i")} AS g$i").mkString(",\n          ")},
          ${oSumF(s"round(-(y*ln($sc) + (1.0-y)*ln(1.0-$sc)), 6)")} AS lsum,
          count(*) AS n
        FROM z$r),
      w$r AS (
        SELECT ${(1 to 5).map(i =>
            s"round(w.w$i - 0.5*round(g.g$i/g.n, 5), 6) AS w$i")
            .mkString(",\n          ")},
          round(g.lsum/g.n, 6) AS loss
        FROM w$p w CROSS JOIN g$r g)"""
  }

  /** Quality-classifier training — distributed logistic regression by
    * full-batch gradient descent ([[graft.operators.LogReg]]): the
    * GPT-3-style curated-vs-crawl filter (Brown et al. 2020 §A —
    * positives from a curated source, a linear model over cheap text
    * features, score the crawl). Features are map-only text-shape
    * metrics on the 6-dp grid (log-length, token count, mean token
    * length, letter-frequency ratio, bias); each of the 8 GD rounds is
    * ONE corpus pass partial-aggregated map-side to a single row
    * (5 gradient components + loss + n) with the weights as literals —
    * the model never joins, never shuffles more than O(dims) values
    * per partition, and stays in whole-stage codegen at any corpus
    * size. The oracle unrolls all 8 rounds ungated and replays feature
    * construction, the σ/gradient arithmetic and the HALF-UP driver
    * updates exactly — weights, final loss and round count all ride
    * the hash gate. Returns one row per feature. */
  val q197LogregQuality = Q(
    "q197_logreg_quality",
    (s, d) => {
      import s.implicits._
      // feature pass is cheap but feeds 8 aggregation rounds — stage it
      // once (the LogReg.train contract: caller owns caching)
      val feats = logregFeaturesOf(documents(s, d)).localCheckpoint()
      val names = Seq("bias", "log_len", "tok_cnt", "tok_len", "e_ratio")
      val fit = LogReg.train(feats, Seq("x1", "x2", "x3", "x4", "x5"),
        "y", rounds = 8, lr = 0.5)
      names.zip(fit.weights).toDF("feature", "weight")
        .withColumn("final_loss", lit(fit.lossTrace.last))
        .withColumn("rounds", lit(8))
    },
    Some {
      val names = Seq("bias", "log_len", "tok_cnt", "tok_len", "e_ratio")
      val tail = names.zipWithIndex.map { case (nm, i) =>
        s"SELECT '$nm' AS feature, w${i + 1} AS weight, " +
          s"loss AS final_loss, 8 AS rounds FROM w8"
      }.mkString("\n      UNION ALL ")
      s"""WITH $logregFeaturesSql,
      w0 AS (SELECT ${(1 to 5).map(i =>
          s"CAST(0 AS DOUBLE) AS w$i").mkString(", ")},
        CAST(NULL AS DOUBLE) AS loss),
      ${(1 to 8).map(logregRoundSql).mkString(",\n      ")}
      $tail"""
    })

  /** Duplicate-cluster canonicalization — the DECISION step that turns
    * dedup signals into a kept/dropped corpus: MinHash-LSH candidate
    * pairs (q27's generator) → connected components (q78's min-label
    * fixed point) → keep the highest-QUALITY member per cluster
    * (q23's composite score; ties to the smallest doc_id), not the
    * smallest-id member q78 keeps — the production rule when near-dups
    * differ in cleanliness (Penedo et al. 2024 keep-best convention).
    * Docs with no candidate pair are their own singleton cluster via a
    * left join + coalesce, so the output is a decision for EVERY doc.
    * Scale shape: candidate generation stays banded-equi-join, quality
    * is expression-only (map-side, no explode shuffle), the argmax is
    * one struct-max groupBy re-joined on the cluster key — every
    * shuffle is keyed, nothing is quadratic. The oracle replays the
    * identical pair set, closure, quality formula and (quality,
    * −doc_id) struct order. */
  val q198DedupCanonical = Q(
    "q198_dedup_canonical",
    (s, d) => {
      val docs = documents(s, d)
      val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 32, numBands = 8, threshold = 0.5)
      val comp = Dedup.connectedComponents(pairs)
      val scored = docs.select(col("doc_id"),
        Text.qualityScore(col("text"), stopwords).as("quality"))
      val labeled = scored.join(
          comp.select(col("id").as("doc_id"), col("component")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster"),
          col("quality"))
      val best = labeled.groupBy("cluster")
        .agg(max(struct(col("quality").as("q"), (-col("doc_id")).as("ni")))
          .as("best"), count(lit(1)).as("n_members"))
      labeled.join(best, Seq("cluster"))
        .select(col("doc_id"), col("cluster"), col("quality"),
          (col("doc_id") === -col("best").getField("ni")).as("keep"),
          col("n_members"))
    },
    Some(minhashPairsSql +
      """,
      p AS (
        SELECT id1, id2 FROM cand
        WHERE len(list_filter(range(1, 33), i -> m1[i] = m2[i])) / 32.0 >= 0.5),
      e AS (SELECT id1 AS u, id2 AS v FROM p
            UNION SELECT id2, id1 FROM p),
      reach(u, v) AS (
        SELECT u, u FROM e
        UNION
        SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
      tq AS (
        SELECT doc_id, text,
          CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
               THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
          END AS toks
        FROM documents),
      q AS (
        SELECT doc_id,
          round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
            * greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
                THEN CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / length(text)
                ELSE 0.0 END) * 5.0)
            * least((CASE WHEN len(toks) > 0
                THEN CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'in'))) AS DOUBLE) / len(toks)
                ELSE 0.0 END) * 5.0, 1.0), 6) AS quality
        FROM tq),
      lab AS (
        SELECT q.doc_id, COALESCE(c.component, q.doc_id) AS cluster, q.quality
        FROM q LEFT JOIN comp c ON c.doc_id = q.doc_id),
      b AS (
        SELECT cluster,
          max(struct_pack(q := quality, ni := -doc_id)) AS best,
          count(*) AS n_members
        FROM lab GROUP BY cluster)
      SELECT l.doc_id, l.cluster, l.quality,
        l.doc_id = -(b.best.ni) AS keep, b.n_members
      FROM lab l JOIN b USING (cluster)"""))

  /** One forward Brandes BFS round as oracle CTEs: expand the hop-(r−1)
    * frontier through the edge set, sum σ over predecessors, anti-join
    * already-settled (seed, node) pairs. Monotone and idempotent past
    * the reached depth, so the unroll is UNGATED (the q192 treatment). */
  private def betwForwardSql(r: Int): String = {
    val p = r - 1
    s"""b$r AS MATERIALIZED (
        SELECT seed, node, hop, sigma FROM b$p
        UNION ALL
        SELECT s.seed, e.dst AS node, $r AS hop,
               CAST(sum(s.sigma) AS BIGINT) AS sigma
        FROM b$p s JOIN ue e ON s.node = e.src AND s.hop = ${r - 1}
        LEFT JOIN b$p x ON x.seed = s.seed AND x.node = e.dst
        WHERE x.node IS NULL
        GROUP BY s.seed, e.dst)"""
  }

  /** One backward Brandes level as oracle CTEs: hop-(h+1) dependencies
    * are final, push (σv/σw)·(1+δw) down one level, re-grid at 6 dp.
    * Levels above the reached depth are structural no-ops. */
  private def betwBackwardSql(h: Int): String = {
    val u = h + 1
    s"""dd$h AS MATERIALIZED (
        SELECT s.seed, s.node, s.hop, s.sigma,
          CASE WHEN s.hop = $h THEN round(COALESCE(c.ds, CAST(0 AS DOUBLE)), 6)
               ELSE s.delta END AS delta
        FROM dd$u s LEFT JOIN (
          SELECT v.seed, v.node,
            CAST(sum(CAST(round((CAST(v.sigma AS DOUBLE) / w.sigma)
              * (CAST(1.0 AS DOUBLE) + w.delta), 12) AS DECIMAL(38,12)))
              AS DOUBLE) AS ds
          FROM dd$u w
          JOIN ue e ON w.node = e.dst AND w.hop = $u
          JOIN dd$u v ON v.seed = w.seed AND v.node = e.src AND v.hop = $h
          GROUP BY v.seed, v.node) c
        ON c.seed = s.seed AND c.node = s.node)"""
  }

  /** Sampled hop-limited betweenness centrality
    * ([[graft.graph.Graph.betweennessSampled]], Brandes 2001 /
    * Brandes & Pich 2007 pivots) over the UNWEIGHTED co-purchase
    * graph — the bridge-node readout completing the centrality tier
    * (degree → q123 rank → q194 closeness → betweenness). Same q194
    * seed set (every 97th part below 2000, size-bounded by
    * construction); paths capped at 6 hops, which bounds rounds, σ
    * magnitude AND the oracle's unroll. Forward: per-seed BFS with
    * exact BIGINT path counts, all seeds advancing in the same rounds.
    * Backward: dependency accumulation level by level under the
    * decimal(38,12) round-sum-round regime. The oracle unrolls 6
    * forward + 5 backward rounds ungated and hash-matches every 6-dp
    * dependency. */
  val q199Betweenness = Q(
    "q199_betweenness",
    (s, d) =>
      graft.graph.Graph.betweennessSampled(
        coOrderWeighted(s, d).select("src", "dst"),
        n => n % 97 === 0 && n < 2000, maxHops = 6),
    Some {
      val maxHops = 6
      val fwd = (1 to maxHops).map(betwForwardSql).mkString(",\n      ")
      val bwd = (maxHops - 1 to 1 by -1).map(betwBackwardSql)
        .mkString(",\n      ")
      s"""WITH $coOrderWeightedSql,
      ue AS MATERIALIZED (SELECT src, dst FROM we),
      b0 AS MATERIALIZED (
        SELECT node AS seed, node, 0 AS hop, CAST(1 AS BIGINT) AS sigma
        FROM (SELECT DISTINCT src AS node FROM ue)
        WHERE node % 97 = 0 AND node < 2000),
      $fwd,
      dd$maxHops AS MATERIALIZED (
        SELECT seed, node, hop, sigma, CAST(0 AS DOUBLE) AS delta
        FROM b$maxHops),
      $bwd
      SELECT node, betweenness FROM (
        SELECT node,
          round(CAST(sum(CAST(round(delta, 12) AS DECIMAL(38,12)))
            AS DOUBLE), 6) AS betweenness
        FROM dd1 WHERE hop > 0 GROUP BY node)
      WHERE betweenness > 0"""
    })

  /** Scalar int8 quantization of the embedding corpus
    * ([[graft.operators.Quantization.sqTrain]]/`sqEncode` — FAISS
    * ScalarQuantizer QT_8bit: one affine byte per dimension, 4× over
    * float32, no codebook training) with the per-dimension error
    * audit: range, reconstruction MSE, worst absolute error, and the
    * clip census (codes pinned at 0/255). Train is ONE corpus
    * aggregate partial-aggregated to 64 groups; ranges ship as
    * literals so encode + reconstruct is a map-only projection — zero
    * shuffles until the 64-group rollup, the shape that holds at any
    * corpus size. Code rounding is floor(v + 0.5), not round(v, 0):
    * x = hi lands EXACTLY on a code boundary for every dimension
    * (structural, not rare) and the engines' integer-round tie
    * conventions differ, while floor is the same IEEE op everywhere. */
  val q200Sq8 = Q(
    "q200_sq8",
    (s, d) => {
      val emb = embeddings(s, d)
      val params = Quantization.sqTrain(emb, "embedding", 64)
      val loA = array(params.map(p => lit(p._1)): _*)
      val hiA = array(params.map(p => lit(p._2)): _*)
      val ex = emb.where(size(col("embedding")) === 64)
        .select(posexplode(col("embedding")).as(Seq("p", "xf")))
        .select((col("p") + 1).as("i"), col("xf").cast("double").as("x"))
        .withColumn("lo", element_at(loA, col("i")))
        .withColumn("hi", element_at(hiA, col("i")))
      val coded = ex
        .withColumn("code",
          Quantization.sqCodeExpr(col("x"), col("lo"), col("hi")))
        .withColumn("err", col("x") -
          Quantization.sqDecodeExpr(col("code"), col("lo"), col("hi")))
      coded.groupBy("i").agg(
        round(min("lo"), 6).as("lo"),
        round(min("hi"), 6).as("hi"),
        round(sum(round(col("err") * col("err") * lit(1e12), 0)
            .cast("long")).cast("double") / lit(1e12) / count(lit(1)), 12)
          .as("mse"),
        max(round(abs(col("err")), 9)).as("max_abs_err"),
        sum(when(col("code") === 0, 1).otherwise(0)).as("n_lo"),
        sum(when(col("code") === 255, 1).otherwise(0)).as("n_hi"))
    },
    Some(s"""WITH ex AS MATERIALIZED (
        SELECT g.i, CAST(e.embedding[g.i] AS DOUBLE) AS x
        FROM embeddings e, generate_series(1, 64) g(i)
        WHERE len(e.embedding) = 64),
      mm AS (SELECT i, min(x) AS lo, max(x) AS hi FROM ex GROUP BY i),
      c AS (
        SELECT ex.i, x, lo, hi,
          CASE WHEN hi = lo THEN 0
               ELSE CAST(greatest(least(
                 floor((x - lo) * 255.0 / (hi - lo) + 0.5), 255.0), 0.0)
                 AS INT) END AS code
        FROM ex JOIN mm USING (i)),
      r AS (
        SELECT i, lo, hi, code,
          x - (lo + CAST(code AS DOUBLE) * (hi - lo) / 255.0) AS err
        FROM c)
      SELECT i, round(min(lo), 6) AS lo, round(min(hi), 6) AS hi,
        round(${oSumF("err * err")} / count(*), 12) AS mse,
        max(round(abs(err), 9)) AS max_abs_err,
        CAST(sum(CASE WHEN code = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        CAST(sum(CASE WHEN code = 255 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
      FROM r GROUP BY i"""))

  /** Dedup-aware curation, end to end in ONE plan — the complement of
    * q122's sweep (which has no dedup stage, the expensive one):
    * quality-gate the corpus (q23's composite ≥ 0.15), then near-dup
    * dedup the SURVIVORS — LSH pairs generated over the filtered frame
    * (filter-before-dedup is the scale-right order: the quadratic-ish
    * stage sees only what passed the cheap map-only gate) — keeping the
    * best-quality member per component (q198's rule), and report the
    * per-source attrition ledger: docs in, quality drops, duplicate
    * drops, kept docs, kept token budget. This is the daily-run shape a
    * training-corpus pipeline executes; every stage is an
    * already-oracled operator and the oracle composes their SQL over
    * the same filtered relation ([[minhashCtesFrom]]). */
  val q201CurationDedup = Q(
    "q201_curation_dedup",
    (s, d) => {
      val scored = documents(s, d).select(col("doc_id"), col("source"),
        col("text"), Text.qualityScore(col("text"), stopwords).as("quality"))
      val surv = scored.where(col("quality") >= 0.15)
      val pairs = Dedup.minHashLshPairs(surv, "doc_id", "text",
        n = 3, numHashes = 32, numBands = 8, threshold = 0.5)
      val comp = Dedup.connectedComponents(pairs)
      val labeled = surv.join(
          comp.select(col("id").as("doc_id"), col("component")),
          Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      val best = labeled.groupBy("cluster")
        .agg(max(struct(col("quality").as("q"), (-col("doc_id")).as("ni")))
          .as("best"))
      val kd = labeled.join(best, Seq("cluster"))
        .select(col("doc_id"),
          (col("doc_id") === -col("best").getField("ni")).as("keep"))
      scored.join(kd, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep").isNull, 1).otherwise(0)).as("n_lowq"),
          sum(when(col("keep") === false, 1).otherwise(0)).as("n_dup_dropped"),
          sum(when(col("keep") === true, 1).otherwise(0)).as("n_kept"),
          sum(when(col("keep") === true,
            Text.tokenCount(col("text")).cast("long")).otherwise(0L))
            .as("kept_tokens"))
    },
    Some(s"""WITH RECURSIVE tq AS (
        SELECT doc_id, text,
          CASE WHEN trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) = ''
               THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
          END AS toks
        FROM documents),
      q AS (
        SELECT doc_id,
          round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
            * greatest(0.0, 1.0 - (CASE WHEN length(text) > 0
                THEN CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / length(text)
                ELSE 0.0 END) * 5.0)
            * least((CASE WHEN len(toks) > 0
                THEN CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of', 'in'))) AS DOUBLE) / len(toks)
                ELSE 0.0 END) * 5.0, 1.0), 6) AS quality
        FROM tq),
      fdocs AS MATERIALIZED (
        SELECT d.doc_id, d.text, q.quality
        FROM documents d JOIN q USING (doc_id)
        WHERE q.quality >= 0.15),
      ${minhashCtesFrom("fdocs")},
      p AS (
        SELECT id1, id2 FROM cand
        WHERE len(list_filter(range(1, 33), i -> m1[i] = m2[i])) / 32.0 >= 0.5),
      e AS (SELECT id1 AS u, id2 AS v FROM p
            UNION SELECT id2, id1 FROM p),
      reach(u, v) AS (
        SELECT u, u FROM e
        UNION
        SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
      comp AS (SELECT u AS doc_id, min(v) AS component FROM reach GROUP BY u),
      lab AS (
        SELECT f.doc_id, COALESCE(c.component, f.doc_id) AS cluster, f.quality
        FROM fdocs f LEFT JOIN comp c ON c.doc_id = f.doc_id),
      b AS (
        SELECT cluster, max(struct_pack(q := quality, ni := -doc_id)) AS best
        FROM lab GROUP BY cluster),
      kd AS (
        SELECT l.doc_id, l.doc_id = -(b.best.ni) AS keep
        FROM lab l JOIN b USING (cluster)),
      tk AS ($duckToksSql)
      SELECT d.source, count(*) AS n_docs,
        CAST(sum(CASE WHEN kd.keep IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq,
        CAST(sum(CASE WHEN kd.keep = false THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_dropped,
        CAST(sum(CASE WHEN kd.keep = true THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN kd.keep = true THEN len(tk.toks) ELSE 0 END) AS BIGINT) AS kept_tokens
      FROM documents d
      LEFT JOIN kd ON kd.doc_id = d.doc_id
      JOIN tk ON tk.doc_id = d.doc_id
      GROUP BY d.source"""))

  /** One ANF round as oracle CTEs: every node's sketch absorbs its
    * out-neighbors' sketches (UNION = the Spark distinct), the k
    * smallest survive under one keyed window, and the hop's
    * neighborhood-function row is the per-node KMV estimate summed as
    * exact DECIMAL(38,4). */
  private def anfRoundSql(r: Int, k: Int, scaleC: String): String = {
    val p = r - 1
    s"""u$r AS (
        SELECT node, h FROM (SELECT node, unnest(kmv) AS h FROM a$p)
        UNION
        SELECT e.src AS node, w.h
        FROM ue e JOIN (SELECT node, unnest(kmv) AS h FROM a$p) w
          ON w.node = e.dst),
      r$r AS (
        SELECT node, h,
          row_number() OVER (PARTITION BY node ORDER BY h) AS rn
        FROM u$r),
      a$r AS MATERIALIZED (
        SELECT node, list(h ORDER BY h) AS kmv
        FROM r$r WHERE rn <= $k GROUP BY node),
      n$r AS (
        SELECT $r AS hop, count(*) AS n_nodes,
          CAST(sum(CAST(round(
            CASE WHEN len(kmv) < $k THEN CAST(len(kmv) AS DOUBLE)
                 ELSE $scaleC / kmv[$k] END, 4) AS DECIMAL(38,4)))
            AS DOUBLE) AS est_pairs
        FROM a$r)"""
  }

  /** Approximate neighborhood function over the co-purchase graph
    * ([[graft.graph.Graph.neighborhoodFunction]] — ANF, Palmer et al.
    * KDD'02 / HyperBall, Boldi & Vigna 2013, with the repo's
    * engine-portable md5-derived KMV in place of HyperLogLog): N(h),
    * the number of node pairs within h hops, estimated from k = 16
    * mergeable bottom-k sketches propagated 4 rounds. THE scale-honest
    * way to read effective diameter — exact N(h) is all-pairs closure
    * (O(n²) state), the sketch is k longs per node at any graph size,
    * and bottom-k-of-union = bottom-k-of-unioned-bottom-k's makes
    * per-round truncation lossless for the estimator. Sub-k sketches
    * ARE the exact set, so small-reach nodes report exactly; saturated
    * nodes report (k−1)·2⁶⁰/kth-hash. The oracle replays hashes,
    * window truncation and estimates round for round; accuracy against
    * brute-force closure is pinned in GraphTopologySpec. */
  val q202Anf = Q(
    "q202_anf",
    (s, d) =>
      graft.graph.Graph.neighborhoodFunction(
        coOrderWeighted(s, d).select("src", "dst"), k = 16, maxHops = 4),
    Some {
      val k = 16
      val scaleC = "17293822569102704640.0" // (k−1)·2^60, exact in double
      val rounds = (1 to 4).map(anfRoundSql(_, k, scaleC))
        .mkString(",\n      ")
      s"""WITH $coOrderWeightedSql,
      ue AS MATERIALIZED (SELECT src, dst FROM we),
      a0 AS MATERIALIZED (
        SELECT node,
          [('0x' || substr(md5('7:' || CAST(node AS VARCHAR)), 1, 15))::BIGINT]
            AS kmv
        FROM (SELECT DISTINCT src AS node FROM ue)),
      $rounds
      ${(1 to 4).map(r => s"SELECT hop, n_nodes, est_pairs FROM n$r")
        .mkString("\n      UNION ALL ")}"""
    })

  /** The q203 water-filling solve as oracle CTEs, ending in
    * `wf(source, supply, target, level, alloc)` — shared with q205's
    * pick materialization. Mirrors [[graft.operators.Packing
    * .waterFill]] clause for clause. */
  private lazy val mixBudgetCtes: String = s"""tk AS ($duckToksSql),
      c AS (
        SELECT d.source, CAST(sum(len(tk.toks)) AS BIGINT) AS supply
        FROM documents d JOIN tk ON tk.doc_id = d.doc_id
        GROUP BY 1 HAVING sum(len(tk.toks)) > 0),
      tots AS (
        SELECT CAST(sum(supply) AS BIGINT) AS tot,
          CAST(sum(CAST(round(sqrt(supply), 6) AS DECIMAL(18,6))) AS DOUBLE)
            AS ptot
        FROM c),
      base AS (
        SELECT source, supply,
          round(round(sqrt(supply), 6) / ptot, 6) AS t,
          CAST(floor(tot * 2 / 5.0) AS BIGINT) AS budget
        FROM c, tots),
      base2 AS (SELECT *, round(supply / t, 6) AS r FROM base),
      ta AS (
        SELECT CAST(sum(CAST(t AS DECIMAL(18,6))) AS DOUBLE) AS tott
        FROM base2),
      rk AS (
        SELECT b.*, ta.tott,
          COALESCE(CAST(sum(supply) OVER (ORDER BY r, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
            AS cumS,
          COALESCE(CAST(sum(CAST(t AS DECIMAL(18,6))) OVER (ORDER BY r, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS DOUBLE), 0.0)
            AS cumT
        FROM base2 b, ta),
      rk2 AS (
        SELECT *, round((budget - cumS) / (tott - cumT), 6) AS lcand FROM rk),
      lv AS (
        SELECT (min(struct_pack(r := r, s := source, l := lcand))).l AS level
        FROM rk2 WHERE lcand <= r),
      wf AS (
        SELECT b.source, b.supply, b.t AS target, lv.level,
          CASE WHEN lv.level IS NULL THEN b.supply
               ELSE least(b.supply,
                 CAST(floor(lv.level * b.t + 0.5) AS BIGINT)) END AS alloc
        FROM rk2 b, lv)"""

  /** Token-budget mixture allocation by exact water-filling — the step
    * AFTER q94's temperature weights: given per-source token supply
    * s_i, temperature targets t_i ∝ round₆(√s_i) (α = 0.5), and a hard
    * budget B = ⌊0.4·Σs⌋, allocate a_i = min(s_i, L·t_i) with the
    * unique level L making Σa_i = B — the data-mixing solve every
    * budgeted pretraining run needs (undersupplied sources cap at one
    * epoch, the rest fill to the level). Closed form, not iteration:
    * sort sources by cap-point r_i = s_i/t_i, one prefix window over
    * the (config-scale) source dimension, L = (B − cumS)/(T − cumT) at
    * the first breakpoint where it clears — so the whole solve is one
    * bounded window + two one-row constKey broadcasts; the corpus-
    * scale work is only the token census. Exact-decimal prefix sums
    * and the floor(x+0.5) integer convention keep every branch
    * engine-replayable; the oracle solves the identical closed form.
    * Output: per source supply, target share, level, allocation,
    * epochs and whether supply (not the level) was binding. */
  val q203MixBudget = Q(
    "q203_mix_budget",
    (s, d) =>
      mixAllocation(s, d)
        .select(col("source"), col("supply"), col("target"),
          col("level"), col("alloc"), col("epochs"), col("supply_capped")),
    Some(s"""WITH $mixBudgetCtes
      SELECT source, supply, target, level, alloc,
        round(alloc / supply, 4) AS epochs,
        alloc = supply AS supply_capped
      FROM wf"""))

  /** q204's cell-partitioned IVF index over YESTERDAY'S corpus
    * (vec_id % 7 ≠ 0), staged once per (process, sfDir) — the build is
    * setup; the measured region is the MAINTENANCE. */
  private val q204IndexByDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Incremental IVF index maintenance — the vector-index twin of q193's
    * incremental components and q187's keyed MERGE: today's embeddings
    * (vec_id % 7 = 0) are assigned against the FROZEN coarse quantizer
    * (centroids from the old corpus — re-quantizing is a rebuild, not
    * maintenance), shaped into index rows by the IDENTICAL arithmetic
    * the builder uses ([[graft.operators.Similarity.indexRows]]), and
    * merged into the cell-partitioned layout —
    * [[graft.sources.Sinks.mergeIntoPartitioned]] rewrites ONLY the
    * cells that received arrivals, upsert-idempotent so every bench
    * iteration measures a real merge. The probe then searches the
    * MAINTAINED index; the oracle replays the frozen-centroid
    * assignment over old+new relationally (q81's shape with the
    * quantizer trained on the old subset) — probe parity is the proof
    * that maintenance reconstructed exactly what a full rebuild over
    * the union would have. */
  val q204IvfIncremental = Q(
    "q204_ivf_incremental",
    (s, d) => {
      val e = embeddings(s, d)
      val isOld = col("vec_id") % 7 =!= 0
      val cent = Clustering.labelCentroids(
        e.where(isOld), "label", "embedding")
      val tag = d.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9_]", "_")
      val path = q204IndexByDir.computeIfAbsent(d, _ => {
        val p = graft.sources.Scratch.dir(s"ivfinc_$tag")
        Similarity.writeIvfIndex(e.where(isOld), "vec_id", "embedding",
          cent, p)
        p
      })
      val arrivals = Similarity.indexRows(
        e.where(!isOld), "vec_id", "embedding", cent)
      graft.sources.Sinks.mergeIntoPartitioned(path, arrivals,
        Seq("neighbor_id"), Seq("cell"))
      Similarity.ivfPartitionedTopK(
        e.where(col("vec_id") < 10), "vec_id", "embedding", cent, path,
        k = 5, nprobe = 2)
    },
    Some("""WITH idx AS (
        SELECT label AS cell, embedding::DOUBLE[] AS ev,
          unnest(generate_series(1, len(embedding))) AS pos
        FROM embeddings WHERE vec_id % 7 <> 0),
      dims AS (
        SELECT cell, pos,
          round(CAST(sum(CAST(ev[CAST(pos AS INT)] AS DECIMAL(28,12))) AS DOUBLE)
            / count(*), 6) AS cv
        FROM idx GROUP BY 1, 2),
      cent AS (
        SELECT cell, list(cv ORDER BY pos) AS centroid FROM dims GROUP BY 1),
      v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      ca AS (
        SELECT vec_id, e, cell,
          row_number() OVER (PARTITION BY vec_id ORDER BY
            list_sum(list_transform(range(1, len(e) + 1),
              i -> pow(e[i] - centroid[i], 2))), cell) AS cr
        FROM v, cent),
      corpus AS (SELECT vec_id AS neighbor_id, e, cell FROM ca WHERE cr = 1),
      pr AS (SELECT vec_id AS probe_id, e AS pe, cell
             FROM ca WHERE cr <= 2 AND vec_id < 10),
      sc AS (
        SELECT pr.probe_id, c.neighbor_id,
          list_cosine_similarity(c.e, pr.pe) AS cosf
        FROM corpus c JOIN pr ON c.cell = pr.cell
          AND c.neighbor_id <> pr.probe_id),
      rk AS (
        SELECT probe_id, neighbor_id, cosf,
          row_number() OVER (PARTITION BY probe_id
            ORDER BY cosf DESC, neighbor_id) AS rank
        FROM sc)
      SELECT probe_id, rank, neighbor_id, round(cosf, 6) AS cos
      FROM rk WHERE rank <= 5"""))

  /** The q203 allocation frame, Spark side — shared by q203 (readout)
    * and q205 (pick materialization). */
  private def mixAllocation(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Guards
    val tok = documents(s, d).groupBy("source")
      .agg(sum(Text.tokenCount(col("text")).cast("long")).as("supply"))
      .where(col("supply") > 0)
    val tots = tok.agg(sum(col("supply")).as("tot"),
        sum(round(sqrt(col("supply").cast("double")), 6)
          .cast("decimal(18,6)")).cast("double").as("ptot"))
      .withColumn("__k", Guards.constKey(col("tot")))
    val base = tok.withColumn("__k", Guards.constKey(col("source")))
      .join(broadcast(tots), "__k")
      .select(col("source"), col("supply"),
        round(round(sqrt(col("supply").cast("double")), 6) / col("ptot"), 6)
          .as("target"),
        floor(col("tot") * lit(2) / lit(5.0)).cast("long").as("budget"))
    Packing.waterFill(base, "source")
  }

  /** Mixture MATERIALIZATION — q203's allocation turned into the actual
    * pick: per source, documents are taken in deterministic hash order
    * (the q95 reproducible-shuffle convention, salt 21) until the next
    * doc would cross the allocated token budget — greedy whole-document
    * packing, so the picked set is a pure function of (corpus, budget)
    * and identical on any cluster size. One keyed window per source
    * (cumulative tokens in hash order) + the allocation broadcast; the
    * census reports picks, picked tokens and budget utilization — the
    * gap to 1.0 is the tail doc that didn't fit, bounded by one doc.
    * Sources whose allocation is smaller than their first doc pick
    * nothing and still report (LEFT join keeps the row). */
  val q205MixMaterialize = Q(
    "q205_mix_materialize",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wf = mixAllocation(s, d).select(col("source"), col("alloc"))
      val w = Window.partitionBy("source")
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val o = documents(s, d).select(col("source"), col("doc_id"),
          Text.tokenCount(col("text")).as("tok"),
          Text.md5Hash64(col("doc_id").cast("string"), 21).as("h"))
        .withColumn("cum", sum("tok").over(w))
      val picks = o.join(wf, "source").where(col("cum") <= col("alloc"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_picked"),
          sum(col("tok").cast("long")).as("picked_tokens"))
      wf.join(picks, Seq("source"), "left")
        .select(col("source"), col("alloc"),
          coalesce(col("n_picked"), lit(0L)).as("n_picked"),
          coalesce(col("picked_tokens"), lit(0L)).as("picked_tokens"),
          round(coalesce(col("picked_tokens"), lit(0L)) / col("alloc"), 4)
            .as("utilization"))
    },
    Some(s"""WITH $mixBudgetCtes,
      o AS (
        SELECT d.source, d.doc_id, len(tk.toks) AS tok,
          sum(len(tk.toks)) OVER (PARTITION BY d.source ORDER BY
            ('0x' || substr(md5('21:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT,
            d.doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents d JOIN tk ON tk.doc_id = d.doc_id),
      p AS (
        SELECT o.source, o.tok FROM o JOIN wf USING (source)
        WHERE o.cum <= wf.alloc),
      pk AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_picked,
          CAST(sum(tok) AS BIGINT) AS picked_tokens
        FROM p GROUP BY source)
      SELECT wf.source, wf.alloc,
        coalesce(pk.n_picked, 0) AS n_picked,
        coalesce(pk.picked_tokens, 0) AS picked_tokens,
        round(coalesce(pk.picked_tokens, 0) / wf.alloc, 4) AS utilization
      FROM wf LEFT JOIN pk USING (source)"""))

  /** Fill-in-the-middle corpus transformation
    * ([[graft.operators.Corpus.fim]], Bavarian et al. 2022): the
    * infilling-pretraining rewrite — hash-selected 50% of documents
    * split at hash-derived points into `<PRE>p<SUF>s<MID>m`. Pure
    * map-only expression work (no shuffle anywhere before the output),
    * reproducible at any cluster size. The output carries the part
    * lengths, an md5 of the transformed text (content rides the hash
    * gate without shipping megabytes through the compare) and the
    * LOSSLESS bit — prefix‖middle‖suffix must reassemble the original
    * byte-for-byte, the invariant that makes the transform safe to
    * apply in place. */
  val q206Fim = Q(
    "q206_fim",
    (s, d) =>
      graft.operators.Corpus.fim(documents(s, d), "doc_id", "text")
        .join(documents(s, d).select(col("doc_id"), col("text")), "doc_id")
        .select(col("doc_id"),
          length(col("prefix")).cast("long").as("prefix_len"),
          length(col("middle")).cast("long").as("mid_len"),
          length(col("suffix")).cast("long").as("suffix_len"),
          (concat(col("prefix"), col("middle"), col("suffix")) === col("text"))
            .as("lossless"),
          md5(col("fim_text")).as("fim_md5")),
    Some("""WITH f AS (
        SELECT doc_id, text, length(text) AS len,
          CAST(floor(length(text) / 3.0) AS BIGINT) AS third
        FROM documents
        WHERE text IS NOT NULL AND length(text) >= 20
          AND ('0x' || substr(md5('30:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 50),
      g AS (
        SELECT doc_id, text, len,
          1 + ('0x' || substr(md5('31:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % third AS a,
          1 + ('0x' || substr(md5('32:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % third AS b
        FROM f),
      p AS (
        SELECT doc_id, text,
          substr(text, 1, CAST(a AS INT)) AS prefix,
          substr(text, CAST(a + 1 AS INT), CAST(len - a - b AS INT)) AS middle,
          substr(text, CAST(len - b + 1 AS INT), CAST(b AS INT)) AS suffix
        FROM g)
      SELECT doc_id,
        CAST(length(prefix) AS BIGINT) AS prefix_len,
        CAST(length(middle) AS BIGINT) AS mid_len,
        CAST(length(suffix) AS BIGINT) AS suffix_len,
        prefix || middle || suffix = text AS lossless,
        md5('<PRE>' || prefix || '<SUF>' || suffix || '<MID>' || middle)
          AS fim_md5
      FROM p"""))

  /** Batch assembly end to end — the chain that turns a curated corpus
    * into training sequences, each stage an already-oracled operator:
    * q203's budget solve picks the per-source token allocation, q205's
    * greedy hash-ordered pick materializes it, the picked corpus
    * shuffles deterministically into 8 shards (q95's
    * [[graft.operators.Packing.shuffleShard]] — md5 shard + per-shard
    * rank, reproducible at any cluster size), and each shard packs
    * concat-and-chunk into 256-token sequences (q79's
    * [[graft.operators.Packing.packSequences]]). The census reports
    * per shard: documents, tokens, sequences, boundary-straddling docs
    * and the fill ratio — the numbers a training run's data loader
    * actually consumes. Every window is shard- or source-keyed; no
    * global sort exists anywhere in the chain. */
  val q207BatchAssembly = Q(
    "q207_batch_assembly",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wf = mixAllocation(s, d).select(col("source"), col("alloc"))
      val w = Window.partitionBy("source")
        .orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val picked = documents(s, d).select(col("source"), col("doc_id"),
          Text.tokenCount(col("text")).as("tok"),
          Text.md5Hash64(col("doc_id").cast("string"), 21).as("h"))
        .withColumn("cum", sum("tok").over(w))
        .join(wf, "source").where(col("cum") <= col("alloc"))
        .select(col("doc_id"), col("tok"))
      val sharded = Packing.shuffleShard(picked, "doc_id", shards = 8,
        salt = 5)
      Packing.packSequences(sharded, Seq("shard"), "pos", "tok", seqLen = 256)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok").cast("long")).as("total_tokens"),
          (max("end_seq") + 1).as("n_seqs"),
          sum(when(col("end_seq") > col("start_seq"), 1).otherwise(0))
            .as("n_straddling"))
        .select(col("shard"), col("n_docs"), col("total_tokens"),
          col("n_seqs"), col("n_straddling"),
          round(col("total_tokens") / (col("n_seqs") * lit(256.0)), 4)
            .as("fill_ratio"))
    },
    Some(s"""WITH $mixBudgetCtes,
      o AS (
        SELECT d.source, d.doc_id, len(tk.toks) AS tok,
          sum(len(tk.toks)) OVER (PARTITION BY d.source ORDER BY
            ('0x' || substr(md5('21:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT,
            d.doc_id ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents d JOIN tk ON tk.doc_id = d.doc_id),
      pk AS (
        SELECT o.doc_id, o.tok FROM o JOIN wf USING (source)
        WHERE o.cum <= wf.alloc),
      hs AS (
        SELECT doc_id, tok,
          ('0x' || substr(md5('5:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        FROM pk),
      sh AS (
        SELECT doc_id, tok, h % 8 AS shard,
          row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS pos
        FROM hs),
      px AS (
        SELECT shard, tok,
          CAST(sum(tok) OVER (PARTITION BY shard ORDER BY pos
            ROWS UNBOUNDED PRECEDING) - tok AS BIGINT) AS off
        FROM sh),
      py AS (
        SELECT shard, tok, off // 256 AS start_seq,
          CASE WHEN tok > 0 THEN (off + tok - 1) // 256
               ELSE off // 256 END AS end_seq
        FROM px)
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(tok) AS BIGINT) AS total_tokens,
        CAST(max(end_seq) + 1 AS BIGINT) AS n_seqs,
        CAST(sum(CASE WHEN end_seq > start_seq THEN 1 ELSE 0 END) AS BIGINT)
          AS n_straddling,
        round(sum(tok) / ((max(end_seq) + 1) * 256.0), 4) AS fill_ratio
      FROM py GROUP BY shard"""))

  /** Edit-distance-verified near-dup pairs ([[Dedup.editVerifiedNearDup]])
    * — the precision tier over q28's banded candidates: SimHash banding
    * proposes (701 candidates here), an exact Levenshtein verify over
    * 256-char normalized prefixes disposes (24 true near-dups — a 29:1
    * precision gap closed with character-level ground truth). Spark runs
    * the BANDED threshold DP (`levenshtein(l, r, maxEdits)`,
    * O(maxEdits·prefix) per pair, −1 above the bound); within the bound
    * it equals the unbounded distance, so DuckDB's plain levenshtein()
    * replays the kept rows exactly. At 100 TB the verify cost is bounded
    * by band collisions × O(maxEdits·prefixLen) — never corpus². */
  val q208EditVerified = Q(
    "q208_edit_verified",
    (s, d) =>
      Dedup.editVerifiedNearDup(documents(s, d), "doc_id", "text",
        maxHamming = 6, prefixLen = 256, maxEdits = 40),
    Some(s"""WITH $simhashCandCtes,
      pfx AS (SELECT doc_id, substr(n, 1, 256) AS p FROM t),
      hv AS (
        SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(h1, h2)) <= 6)
      SELECT hv.id1, hv.id2, hv.hamming,
        CAST(levenshtein(a.p, b.p) AS INT) AS edit_dist
      FROM hv JOIN pfx a ON a.doc_id = hv.id1 JOIN pfx b ON b.doc_id = hv.id2
      WHERE levenshtein(a.p, b.p) <= 40"""))

  /** EXACT heavy hitters by Misra–Gries candidates + exact verify
    * ([[Sketches.heavyHitters]]). The key stream is built head+tail:
    * p_name tokens (16 heavy keys, each ~4% of the stream at every SF)
    * unioned with each part's unique key string (a distinct-key tail that
    * grows with SF — 2k keys at sf0.01, 20k at sf0.1) — so the one-scan
    * census alternative shuffles the whole tail while the MG pass ships
    * k=512 counters, and phi=0.01 keeps the answer the same 16 rows at
    * any scale. Output counts are EXACT (pass-2 recount of <= k
    * candidates), so the oracle is a plain census HAVING — the engines
    * agree even though the driver never shuffles the tail. */
  val q209HeavyHitters = Q(
    "q209_heavy_hitters",
    (s, d) => {
      val p = part(s, d)
      val keyed = p.select(explode(Text.tokens(col("p_name"))).as("key"))
        .unionByName(p.select(col("p_partkey").cast("string").as("key")))
      Sketches.heavyHitters(keyed, col("key"), phi = 0.01, k = 512)
    },
    Some("""WITH k AS (
        SELECT unnest(string_split(
          trim(regexp_replace(lower(p_name), '\s+', ' ', 'g')), ' ')) AS key
        FROM part
        UNION ALL
        SELECT CAST(p_partkey AS VARCHAR) FROM part),
      n AS (SELECT count(*) AS nn FROM k)
      SELECT key, count(*) AS cnt,
        round(count(*) / CAST((SELECT nn FROM n) AS DOUBLE), 6) AS share
      FROM k GROUP BY key
      HAVING count(*) >= ceil(0.01 * (SELECT nn FROM n))"""))

  /** One k-center greedy round as DuckDB CTEs: min-distance map against
    * the centers so far (`cc\$p`), farthest pick via the min-struct
    * (−d, id) trick, appended to the center set — the
    * [[Clustering.kCenterGreedy]] recurrence under the q93/q185 6-dp
    * distance discipline. */
  private def kcenterRoundSql(n: Int): String = {
    val p = n - 1
    s"""
      dm$n AS (
        SELECT p.vec_id,
          min(round(list_aggregate(list_transform(range(1, 65),
            i -> (p.v[i] - c.v[i]) * (p.v[i] - c.v[i])), 'sum'), 6)) AS d
        FROM p CROSS JOIN cc$p c GROUP BY p.vec_id),
      pk$n AS (
        SELECT min(struct_pack(nd := -d, id := vec_id)) AS s FROM dm$n),
      cc$n AS MATERIALIZED (
        SELECT * FROM cc$p UNION ALL
        SELECT $n AS round, d.vec_id AS center_id, d.d AS radius, p.v
        FROM dm$n d JOIN pk$n ON d.vec_id = pk$n.s.id
        JOIN p ON p.vec_id = d.vec_id)"""
  }

  /** k-center greedy coreset selection + assignment audit
    * ([[Clustering.kCenterGreedy]]/[[kCenterAssign]]): 8 farthest-point
    * picks over the embeddings (Gonzalez'85 / Sener-Savarese coreset),
    * then every point assigned to its nearest pick — per-center
    * population and true coverage radius. The oracle unrolls the same 8
    * greedy rounds; picks, radii, assignment and coverage must agree
    * bit-for-bit on the 6-dp distance grid. */
  val q210KcenterCoreset = Q(
    "q210_kcenter_coreset",
    (s, d) => {
      val emb = embeddings(s, d)
      val picks = Clustering.kCenterGreedy(emb, "vec_id", "embedding", k = 8)
      Clustering.kCenterAssign(emb, "vec_id", "embedding", picks)
    },
    Some(s"""WITH p AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cc0 AS (
        SELECT 0 AS round, vec_id AS center_id, CAST(NULL AS DOUBLE) AS radius, v
        FROM p WHERE vec_id = (SELECT min(vec_id) FROM p)),
      ${(1 to 7).map(kcenterRoundSql).mkString(",\n")},
      asg AS (
        SELECT p.vec_id,
          min(struct_pack(
            d := round(list_aggregate(list_transform(range(1, 65),
              i -> (p.v[i] - c.v[i]) * (p.v[i] - c.v[i])), 'sum'), 6),
            r := c.round)) AS s
        FROM p CROSS JOIN cc7 c GROUP BY p.vec_id),
      agg AS (
        SELECT s.r AS round, count(*) AS n_assigned, max(s.d) AS coverage
        FROM asg GROUP BY 1)
      SELECT CAST(c.round AS BIGINT) AS round, c.center_id, c.radius,
        a.n_assigned, a.coverage
      FROM cc7 c JOIN agg a USING (round)"""))

  /** Exact-substring dedup APPLY ([[Corpus.exciseDuplicateSpans]]) —
    * q156 detects duplicated spans, this rewrites the corpus with them
    * excised (Lee et al. 2022: drop the substring, keep the unique
    * remainder). The oracle replays the k-gram census, position
    * explosion and the token-level stitch (string_agg over surviving
    * positions), so the REWRITTEN TEXT itself hash-matches — the
    * strongest possible check of the surgery. */
  val q211DedupRewrite = Q(
    "q211_dedup_rewrite",
    (s, d) =>
      Corpus.exciseDuplicateSpans(documents(s, d), "doc_id", "text", k = 8),
    Some(s"""WITH t AS ($duckToksSql),
      c AS (
        SELECT doc_id, unnest(range(0, len(toks) - 7)) AS start, toks
        FROM t WHERE len(toks) >= 8),
      s AS (
        SELECT doc_id, start,
          ('0x' || substr(md5('0:' ||
            array_to_string(toks[start + 1 : start + 8], ' ')), 1, 15))::BIGINT AS key
        FROM c),
      dk AS (
        SELECT key FROM (SELECT DISTINCT key, doc_id FROM s)
        GROUP BY key HAVING count(*) >= 2),
      rm AS (
        SELECT DISTINCT doc_id, unnest(range(start, start + 8)) AS pos
        FROM s JOIN dk USING (key)),
      ra AS (SELECT doc_id, count(*) AS removed FROM rm GROUP BY 1),
      tp AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks FROM t),
      tk AS (SELECT doc_id, pos, toks[pos + 1] AS tok FROM tp),
      ct AS (
        SELECT k.doc_id, string_agg(k.tok, ' ' ORDER BY k.pos) AS clean_text
        FROM tk k
        WHERE NOT EXISTS (SELECT 1 FROM rm
          WHERE rm.doc_id = k.doc_id AND rm.pos = k.pos)
        GROUP BY k.doc_id)
      SELECT t.doc_id, len(t.toks) AS n_tokens,
        coalesce(ra.removed, 0) AS removed_tokens,
        coalesce(ct.clean_text, '') AS clean_text
      FROM t LEFT JOIN ra USING (doc_id) LEFT JOIN ct USING (doc_id)"""))

  /** Newman modularity of the supplier NATION partition over the
    * co-supply graph ([[graft.graph.Graph.modularity]]) — does a
    * metadata attribute explain the graph's structure, or is the
    * partition no better than the degree-preserving null model (Q ≈
    * 0)? The attribute partition is the discriminating test here: the
    * q188 LPA labels collapse to one community on this dense graph
    * (Q = 0 by construction — vacuous), while 25 nations give 25
    * distinct contributions. Per-community degree mass and intra-edge
    * counts are integer-exact; each contribution is two IEEE divisions
    * on exact integers rounded at 12 dp; the global Q is their
    * decimal-exact sum — bit-replayable in SQL. */
  val q212Modularity = Q(
    "q212_modularity",
    (s, d) => {
      val labels = supplier(s, d)
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(concat(lit("s"), col("s_suppkey")).as("node"),
          col("n_name").as("label"))
      graft.graph.Graph.modularity(coSupplyEdges(s, d), labels)
        .orderBy(col("label"))
    },
    Some(s"""WITH li AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS ok,
          's' || CAST(l_suppkey AS VARCHAR) AS sup
        FROM lineitem),
      pr AS (
        SELECT x.sup AS s1, y.sup AS s2, count(*) AS co
        FROM li x JOIN li y ON x.ok = y.ok AND x.sup < y.sup
        GROUP BY 1, 2),
      thr AS (SELECT avg(co) AS m FROM pr),
      ed AS MATERIALIZED (SELECT s1, s2 FROM pr, thr WHERE co > m),
      und AS MATERIALIZED (
        SELECT s1 AS a, s2 AS b FROM ed UNION SELECT s2, s1 FROM ed),
      lab AS MATERIALIZED (
        SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node, n_name AS lab
        FROM supplier JOIN nation ON s_nationkey = n_nationkey),
      mm AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM ed),
      deg AS (SELECT a AS node, count(*) AS deg FROM und GROUP BY 1),
      dc AS (
        SELECT l.lab, count(*) AS nodes,
          CAST(sum(d.deg) AS BIGINT) AS deg_sum
        FROM lab l JOIN deg d USING (node) GROUP BY 1),
      intra AS (
        SELECT la.lab, count(*) AS intra
        FROM ed e JOIN lab la ON e.s1 = la.node
          JOIN lab lb ON e.s2 = lb.node
        WHERE la.lab = lb.lab GROUP BY 1),
      perc AS (
        SELECT dc.lab AS label, dc.nodes, dc.deg_sum,
          CAST(coalesce(i.intra, 0) AS BIGINT) AS intra_edges,
          ${proundSql(
            "coalesce(i.intra, 0) / mm.m - " +
            "(dc.deg_sum / (2.0 * mm.m)) * (dc.deg_sum / (2.0 * mm.m))",
            12)} AS q_contrib
        FROM dc LEFT JOIN intra i ON dc.lab = i.lab CROSS JOIN mm),
      qt AS (
        SELECT CAST(sum(CAST(q_contrib AS DECIMAL(28,12))) AS DOUBLE) AS q
        FROM perc)
      SELECT p.label, p.nodes, p.deg_sum, p.intra_edges, p.q_contrib,
        ${proundSql("qt.q", 12)} AS modularity
      FROM perc p CROSS JOIN qt ORDER BY p.label"""))

  /** One MMR greedy round as DuckDB CTEs: max-sim-to-selected over the
    * not-yet-selected candidates, the two-literal score, the min-struct
    * argmax pick, appended to the selected set — the
    * [[Similarity.mmrSelect]] recurrence on the 6-dp cosine grid. */
  private def mmrRoundSql(n: Int): String = {
    val p = n - 1
    s"""
      ms$n AS (
        SELECT c.probe_id, c.cand_id, c.rel, max(p.sim) AS ms
        FROM cand c
        JOIN pairs p ON p.probe_id = c.probe_id AND p.id1 = c.cand_id
        JOIN sel$p s ON s.probe_id = p.probe_id AND s.sel_id = p.id2
        WHERE NOT EXISTS (SELECT 1 FROM sel$p x
          WHERE x.probe_id = c.probe_id AND x.sel_id = c.cand_id)
        GROUP BY 1, 2, 3),
      sc$n AS (
        SELECT probe_id, cand_id, rel, ms,
          CAST(0.7 AS DOUBLE) * rel - CAST(0.3 AS DOUBLE) * ms AS score
        FROM ms$n),
      pk$n AS (
        SELECT probe_id, min(struct_pack(ns := -score, id := cand_id)) AS s
        FROM sc$n GROUP BY 1),
      sel$n AS MATERIALIZED (
        SELECT * FROM sel$p UNION ALL
        SELECT m.probe_id, m.cand_id AS sel_id, $n AS pick, m.rel AS cos,
          m.ms AS max_sim, round(m.score, 6) AS mmr
        FROM sc$n m JOIN pk$n k
          ON m.probe_id = k.probe_id AND m.cand_id = k.s.id)"""
  }

  /** MMR diversified retrieval ([[Similarity.mmrSelect]]): each probe's
    * top-20 cosine candidates greedily re-ranked to 5 picks balancing
    * relevance (0.7) against redundancy with what's already picked
    * (0.3). The oracle replays the q26 LATERAL candidate generator, the
    * candidate-pair cosine grid, and all four greedy rounds
    * ([[mmrRoundSql]]) — picks, order, and scores hash-match. */
  val q213Mmr = Q(
    "q213_mmr_rerank",
    (s, d) => {
      val emb = embeddings(s, d)
      Similarity.mmrSelect(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", "vec_id", candK = 20, selectK = 5,
          relWeight = 0.7, divWeight = 0.3)
        .orderBy(col("probe_id"), col("pick"))
    },
    Some(s"""WITH cand AS MATERIALIZED (
        SELECT p.vec_id AS probe_id, n.rank, n.cand_id, n.rel
        FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) p,
        LATERAL (
          SELECT c.vec_id AS cand_id,
            row_number() OVER (ORDER BY
              list_cosine_similarity(c.embedding::DOUBLE[],
                (SELECT embedding FROM embeddings e
                 WHERE e.vec_id = p.vec_id)::DOUBLE[]) DESC,
              c.vec_id) AS rank,
            round(list_cosine_similarity(c.embedding::DOUBLE[],
              (SELECT embedding FROM embeddings e
               WHERE e.vec_id = p.vec_id)::DOUBLE[]), 6) AS rel
          FROM embeddings c WHERE c.vec_id <> p.vec_id
          ORDER BY rank LIMIT 20) n),
      pairs AS MATERIALIZED (
        SELECT a.probe_id, a.cand_id AS id1, b.cand_id AS id2,
          round(list_cosine_similarity(av.embedding::DOUBLE[],
            bv.embedding::DOUBLE[]), 6) AS sim
        FROM cand a JOIN cand b
          ON a.probe_id = b.probe_id AND a.cand_id <> b.cand_id
        JOIN embeddings av ON av.vec_id = a.cand_id
        JOIN embeddings bv ON bv.vec_id = b.cand_id),
      sel1 AS MATERIALIZED (
        SELECT probe_id, cand_id AS sel_id, 1 AS pick, rel AS cos,
          CAST(NULL AS DOUBLE) AS max_sim, CAST(NULL AS DOUBLE) AS mmr
        FROM cand WHERE rank = 1),
      ${(2 to 5).map(mmrRoundSql).mkString(",\n")}
      SELECT probe_id, CAST(pick AS INT) AS pick, sel_id, cos, max_sim, mmr
      FROM sel5 ORDER BY probe_id, pick"""))

  /** One deterministic-walk step as DuckDB CTEs: hash-argmin over the
    * current node's neighbors under the md5Hash64 convention — the
    * [[graft.graph.Graph.randomWalks]] recurrence. */
  private def walkStepSql(t: Int): String = {
    val p = t - 1
    s"""
      ch$t AS (
        SELECT w.wid,
          min(struct_pack(
            h := ('0x' || substr(md5('7:' || w.wid || ':' || '$t' || ':' ||
              CAST(e.b AS VARCHAR)), 1, 15))::BIGINT,
            n := e.b)) AS s
        FROM wk$p w JOIN und e ON w.node = e.a
        GROUP BY 1),
      wk$t AS MATERIALIZED (SELECT wid, s.n AS node FROM ch$t)"""
  }

  /** Random-walk corpus generation over the parts co-purchase graph
    * ([[graft.graph.Graph.randomWalks]]): 2 walkers per seed part, 8
    * hash-argmin steps on the undirected view — the DeepWalk sequence
    * corpus an embedding trainer consumes, fully replayable. The
    * oracle unrolls all 8 steps ([[walkStepSql]]) and stitches the
    * walk strings; sequences hash-match token for token. */
  val q214RandomWalks = Q(
    "q214_random_walks",
    (s, d) =>
      graft.graph.Graph.randomWalks(coOrderEdges(s, d),
          node => node <= 20, walkLen = 8, walksPerSeed = 2)
        .orderBy(col("walk_id")),
    Some(s"""WITH $coOrderEdgesSql,
      sd AS (SELECT DISTINCT a AS node FROM und WHERE a <= 20),
      wk0 AS MATERIALIZED (
        SELECT CAST(node AS VARCHAR) || '#' || CAST(r.r AS VARCHAR) AS wid,
          node
        FROM sd CROSS JOIN (SELECT unnest([1, 2]) AS r) r),
      ${(1 to 8).map(walkStepSql).mkString(",\n")},
      tr AS (
        ${(0 to 8).map(t =>
          s"SELECT wid, $t AS step, node FROM wk$t")
          .mkString("\n        UNION ALL ")})
      SELECT wid AS walk_id, count(*) AS steps,
        string_agg(CAST(node AS VARCHAR), ' ' ORDER BY step) AS walk
      FROM tr GROUP BY 1 ORDER BY 1"""))

  /** Perceptual image near-dup ([[graft.multimodal.Binary.aHashPairs]]):
    * aHash signatures over the bytes-as-pixels view of the document
    * blobs, banded + hamming-verified at <= 6 bits. On the synthetic
    * corpus the planted near-dup pairs land at hamming 0 with the noise
    * floor starting at 8 — the threshold sits in the gap. Above-3
    * banding recall is approximate by design (the q28 16-bit pigeonhole
    * is complete only to 3 bits); the oracle replays the identical
    * banding so both engines see the same candidate set. Bit 63 needs
    * its literal value in SQL: DuckDB's `1::BIGINT << 63` raises
    * instead of wrapping. */
  val q215AhashDedup = Q(
    "q215_ahash_dedup",
    (s, d) =>
      graft.multimodal.Binary.aHashPairs(
          documents(s, d).withColumn("bytes", encode(col("text"), "UTF-8")),
          "doc_id", "bytes", maxHamming = 6)
        .orderBy(col("id1"), col("id2")),
    Some {
      val pix = (0 until 64).map { b =>
        s"('0x' || substr(hx, 2*(((${b / 8}*side) >> 3)*side + " +
          s"((${b % 8}*side) >> 3))+1, 2))::INT AS p$b"
      }.mkString(",\n          ")
      val total = (0 until 64).map(b => s"p$b").mkString(" + ")
      val sig = (0 until 64).map { b =>
        val w = if (b == 63) "CAST(-9223372036854775808 AS BIGINT)"
                else s"(1::BIGINT << $b)"
        s"CASE WHEN 64*p$b > s THEN $w ELSE 0::BIGINT END"
      }.mkString("\n          + ")
      s"""WITH hb AS (
        SELECT doc_id, hex(encode(text)) AS hx,
          CAST(floor(sqrt(CAST(octet_length(encode(text)) AS DOUBLE)))
            AS INT) AS side
        FROM documents),
      px AS (
        SELECT doc_id, side,
          $pix
        FROM hb WHERE side >= 8),
      ss AS (SELECT *, $total AS s FROM px),
      sig AS (
        SELECT doc_id,
          $sig AS ahash
        FROM ss),
      ch AS (
        SELECT doc_id, ahash, cs.chunk,
          (ahash >> (cs.chunk * 16)) & 65535 AS key
        FROM sig, (SELECT unnest(range(0, 4)) AS chunk) cs),
      cand AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
          a.ahash AS h1, b.ahash AS h2
        FROM ch a JOIN ch b
          ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id)
      SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
      FROM cand WHERE bit_count(xor(h1, h2)) <= 6
      ORDER BY id1, id2"""
    })

  /** nDCG@10 graded retrieval eval — the rank-SENSITIVE companion to
    * q181's recall gate: recall@5 counts hits anywhere in the window,
    * nDCG grades each hit by the brute-force ground-truth rank (rel =
    * 11 − truth_rank) and discounts it by retrieval position
    * (ln-ratio log2, the verify-recipe ln/ln discipline), so an index
    * that returns the right neighbors in the WRONG order now scores
    * below one that orders them correctly. Per-probe DCG is normalized
    * by that probe's own ideal DCG (short truth lists handled), terms
    * ride the 12-dp decimal-exact regime, and the oracle composes the
    * constituent queries' oracle SQL end-to-end like q181. */
  val q216NdcgEval = Q(
    "q216_ndcg_eval",
    (s, d) => {
      val emb = embeddings(s, d)
      val truth = Similarity.bruteForceTopK(emb,
          emb.where(col("vec_id") < 10), "vec_id", "embedding", "vec_id",
          k = 10)
        .select(col("probe_id"), col("rank").as("t_rank"),
          col("neighbor_id"))
        .localCheckpoint()
      val term = (rel: Column, pos: Column) =>
        round((lit(11) - rel) / (log(pos + lit(1)) / log(lit(2.0))), 12)
          .cast("decimal(28,12)")
      val idcg = truth.groupBy("probe_id")
        .agg(sum(term(col("t_rank"), col("t_rank"))).cast("double")
          .as("idcg"))
      val probes = truth.select("probe_id").distinct()
      def ndcg(method: String, res: DataFrame): DataFrame = {
        val dcg = res.where(col("rank") <= 10)
          .select(col("probe_id"), col("rank"), col("neighbor_id"))
          .join(truth, Seq("probe_id", "neighbor_id"))
          .groupBy("probe_id")
          .agg(sum(term(col("t_rank"), col("rank"))).cast("double")
            .as("dcg"))
        probes.join(idcg, Seq("probe_id"))
          .join(dcg, Seq("probe_id"), "left")
          .select(Exprs.pround(coalesce(col("dcg"), lit(0.0)) / col("idcg"),
            6).as("nd"))
          .agg(count(lit(1)).as("n_probes"),
            Exprs.pround(sum(col("nd").cast("decimal(28,6)")).cast("double")
              / count(lit(1)), 6).as("ndcg_at_10"))
          .select(lit(method).as("method"), col("n_probes"),
            col("ndcg_at_10"))
      }
      ndcg("q29_ann_lsh", q29AnnLsh.run(s, d))
        .unionByName(ndcg("q109_ann_multiprobe",
          q109AnnMultiprobe.run(s, d)))
        .unionByName(ndcg("q81_ivf", q81IvfAnn.run(s, d)))
        .unionByName(ndcg("q147_rp", q147RpAnn.run(s, d)))
        .orderBy(col("method"))
    },
    Some {
      def ndcgSql(method: String, inner: String): String = s"""
        SELECT '$method' AS method,
          CAST(count(*) AS BIGINT) AS n_probes,
          ${proundSql(
            "CAST(sum(CAST(nd AS DECIMAL(28,6))) AS DOUBLE) / count(*)",
            6)} AS ndcg_at_10
        FROM (
          SELECT p.probe_id,
            ${proundSql("coalesce(d.dcg, 0) / i.idcg", 6)} AS nd
          FROM probes p
          JOIN idcg i ON i.probe_id = p.probe_id
          LEFT JOIN (
            SELECT r.probe_id,
              CAST(sum(CAST(round((11 - t.t_rank) /
                (ln(r.rank + 1) / ln(CAST(2.0 AS DOUBLE))), 12)
                AS DECIMAL(28,12))) AS DOUBLE) AS dcg
            FROM ($inner) r JOIN truth t
              ON r.probe_id = t.probe_id AND r.neighbor_id = t.neighbor_id
            WHERE r.rank <= 10
            GROUP BY 1) d ON d.probe_id = p.probe_id)"""
      s"""WITH truth AS MATERIALIZED (
        SELECT p.vec_id AS probe_id, n.rank AS t_rank, n.neighbor_id
        FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) p,
        LATERAL (
          SELECT c.vec_id AS neighbor_id,
            row_number() OVER (ORDER BY
              list_cosine_similarity(c.embedding::DOUBLE[],
                (SELECT embedding FROM embeddings e
                 WHERE e.vec_id = p.vec_id)::DOUBLE[]) DESC,
              c.vec_id) AS rank
          FROM embeddings c WHERE c.vec_id <> p.vec_id
          ORDER BY rank LIMIT 10) n),
      probes AS (SELECT DISTINCT probe_id FROM truth),
      idcg AS (
        SELECT probe_id,
          CAST(sum(CAST(round((11 - t_rank) /
            (ln(t_rank + 1) / ln(CAST(2.0 AS DOUBLE))), 12)
            AS DECIMAL(28,12))) AS DOUBLE) AS idcg
        FROM truth GROUP BY 1)
      SELECT * FROM (
      ${ndcgSql("q29_ann_lsh", q29AnnLsh.oracle.get)}
      UNION ALL
      ${ndcgSql("q109_ann_multiprobe", q109AnnMultiprobe.oracle.get)}
      UNION ALL
      ${ndcgSql("q81_ivf", q81IvfAnn.oracle.get)}
      UNION ALL
      ${ndcgSql("q147_rp", q147RpAnn.oracle.get)})
      ORDER BY method"""
    })

  /** Seasonal decomposition of the daily event series per event_type
    * ([[TimeSeries.stlDecompose]], weekly period): trend = centered
    * 7-day moving average, seasonal = centered day-of-week effect of
    * the detrended interior, remainder = residual — the monitoring
    * decomposition that separates "weekends are always slow" from "this
    * Tuesday is anomalous". Integer window sums + 6-dp decimal means,
    * so every component hash-matches the window-function replay. */
  val q217StlDecompose = Q(
    "q217_stl_decompose",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
      TimeSeries.stlDecompose(daily, "event_type", "day", "y", period = 7)
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH s AS (
        SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS y
        FROM events GROUP BY 1, 2),
      t AS (
        SELECT event_type, d, y,
          CASE WHEN count(*) OVER w = 7
            THEN floor(sum(y) OVER w / CAST(7 AS DOUBLE)
              * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
              / CAST(1000000 AS DOUBLE) END AS trend
        FROM s WINDOW w AS (PARTITION BY event_type ORDER BY d
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      dt AS (
        SELECT event_type, (d - DATE '1970-01-01') % 7 AS ph,
          y - trend AS detr
        FROM t WHERE trend IS NOT NULL),
      sr AS (
        SELECT event_type, ph,
          floor(CAST(sum(CAST(detr AS DECIMAL(28,6))) AS DOUBLE)
            / count(*) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
            / CAST(1000000 AS DOUBLE) AS sraw
        FROM dt GROUP BY 1, 2),
      sm AS (
        SELECT event_type,
          floor(CAST(sum(CAST(sraw AS DECIMAL(28,6))) AS DOUBLE)
            / count(*) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
            / CAST(1000000 AS DOUBLE) AS smean
        FROM sr GROUP BY 1),
      se AS (
        SELECT sr.event_type, sr.ph,
          floor((sr.sraw - sm.smean) * CAST(1000000 AS DOUBLE)
            + CAST(0.5 AS DOUBLE)) / CAST(1000000 AS DOUBLE) AS seasonal
        FROM sr JOIN sm USING (event_type))
      SELECT t.event_type, t.d AS day, t.y, t.trend, se.seasonal,
        CASE WHEN t.trend IS NOT NULL
          THEN floor((t.y - t.trend - se.seasonal)
            * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
            / CAST(1000000 AS DOUBLE) END AS remainder
      FROM t LEFT JOIN se ON se.event_type = t.event_type
        AND se.ph = (t.d - DATE '1970-01-01') % 7
      ORDER BY 1, 2"""))

  /** Adamic–Adar supplier affinity ([[graft.graph.Graph.adamicAdar]])
    * over the customer→supplier bipartite graph: two suppliers score
    * high when many LOW-degree customers buy from both (shared niche
    * customers beat shared mass-market ones). Centers are capped at
    * degree 50 and hash-sampled 1 in 4 — the deterministic skew bounds
    * that keep wedge volume ≤ cap·m/4 at any scale; suppliers (degree
    * ~600) fall out via the cap, so customers are the centers by
    * construction. Top-50 by (exact score, pair) — the oracle replays
    * the sampling, the cap, the 12-dp weight sums and the cut. */
  val q218AdamicAdar = Q(
    "q218_adamic_adar",
    (s, d) => {
      val e = orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.graph.Graph.adamicAdar(e, maxCenterDeg = 50, sampleMod = 4,
        topK = 50)
    },
    Some("""WITH e0 AS MATERIALIZED (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
          's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      ec AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS n1, greatest(src, dst) AS n2
        FROM e0 WHERE src <> dst),
      und AS MATERIALIZED (
        SELECT n1 AS a, n2 AS b FROM ec UNION ALL SELECT n2, n1 FROM ec),
      deg AS (SELECT a AS node, count(*) AS d FROM und GROUP BY 1),
      ctr AS (
        SELECT node, d FROM deg
        WHERE d >= 2 AND d <= 50
          AND ('0x' || substr(md5('7:' || node), 1, 15))::BIGINT % 4 = 0),
      adj AS (
        SELECT u.a AS z, u.b AS nbr, c.d
        FROM und u JOIN ctr c ON u.a = c.node),
      sc AS (
        SELECT x.n1, y.n2, count(*) AS common,
          CAST(sum(CAST(round(CAST(1.0 AS DOUBLE) / ln(CAST(x.d AS DOUBLE)),
            12) AS DECIMAL(28,12))) AS DOUBLE) AS aa
        FROM (SELECT z, nbr AS n1, d FROM adj) x
        JOIN (SELECT z, nbr AS n2 FROM adj) y
          ON x.z = y.z AND x.n1 < y.n2
        GROUP BY 1, 2)
      SELECT n1 AS node1, n2 AS node2, common, round(aa, 9) AS aa
      FROM sc
      WHERE NOT EXISTS (SELECT 1 FROM ec
        WHERE ec.n1 = sc.n1 AND ec.n2 = sc.n2)
      ORDER BY sc.aa DESC, n1, n2 LIMIT 50"""))

  /** Portable half-up rounding in SQL — the oracle-side mirror of
    * [[graft.functions.Exprs.pround]]. */
  private def proundSql(x: String, s: Int): String = {
    val m = "1" + "0" * s
    s"floor(($x) * CAST($m AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST($m AS DOUBLE)"
  }

  /** q219's two-epoch parquet table (pre-1998 orders WITHOUT
    * o_orderpriority, 1998+ WITH it — the column-added-mid-history
    * shape every long-lived lake table grows), staged once per
    * (process, sfDir). */
  private val q219TableByDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Schema-evolution union read: `mergeSchema` over epochs whose file
    * schemas differ — early rows surface the later column as NULL, and
    * the per-epoch census (row counts, exact totals, priority
    * null/distinct counts) proves no row or value was lost or
    * fabricated by the widening. `schema_evolved` is a driver-verified
    * precondition boolean riding the hash gate (the q189 pattern): it
    * certifies the staged epochs REALLY disagree on schema, so the
    * oracle's expectations are about an actual evolution, not two
    * identical files. Steady state measures the merged read — the
    * honest recurring cost of an evolved table. */
  val q219SchemaEvolution = Q(
    "q219_schema_evolution",
    (s, d) => {
      val tag = d.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9_]", "_")
      val path = q219TableByDir.computeIfAbsent(d, _ => {
        val p = graft.sources.Scratch.dir(s"evolve_$tag")
        val o = orders(s, d).withColumn("o_year", year(col("o_orderdate")))
        o.where(col("o_year") < 1998)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$p/epoch=1")
        o.where(col("o_year") >= 1998)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .write.mode("overwrite").parquet(s"$p/epoch=2")
        p
      })
      val f1 = s.read.parquet(s"$path/epoch=1").schema.fieldNames.toSet
      val f2 = s.read.parquet(s"$path/epoch=2").schema.fieldNames.toSet
      val evolved = !f1.contains("o_orderpriority") &&
        f2.contains("o_orderpriority")
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy(col("epoch"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice"), 2).cast("decimal(28,2)"))
            .cast("double").as("total"),
          count(col("o_orderpriority")).as("n_priority"),
          countDistinct(col("o_orderpriority")).as("d_priority"))
        .withColumn("schema_evolved", lit(evolved))
        .orderBy(col("epoch"))
    },
    Some("""SELECT epoch, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(28,2)))
          AS DOUBLE) AS total,
        CAST(CASE WHEN epoch = 1 THEN 0 ELSE count(*) END
          AS BIGINT) AS n_priority,
        CAST(CASE WHEN epoch = 1 THEN 0
          ELSE count(DISTINCT o_orderpriority) END AS BIGINT) AS d_priority,
        true AS schema_evolved
      FROM (SELECT *, CASE WHEN year(o_orderdate) < 1998 THEN 1 ELSE 2 END
        AS epoch FROM orders)
      GROUP BY epoch ORDER BY epoch"""))

  /** Quantity-weighted median price per (returnflag, ship year)
    * ([[Robust.weightedMedian]]) — each line item counts its quantity
    * times, the survey-stats location a mean can't give. Cumulative
    * integer weights under a total order; the oracle replays the
    * window + threshold pick exactly. */
  val q220WeightedMedian = Q(
    "q220_weighted_median",
    (s, d) => {
      val li = lineitem(s, d).select(col("l_returnflag"),
        year(col("l_shipdate")).as("ship_year"), col("l_extendedprice"),
        col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      Robust.weightedMedian(li, Seq("l_returnflag", "ship_year"),
          col("l_extendedprice"), col("l_quantity"),
          Seq(col("l_orderkey"), col("l_linenumber")))
        .orderBy(col("l_returnflag"), col("ship_year"))
    },
    Some("""WITH b AS (
        -- floor(w + 0.5) BEFORE the BIGINT cast, mirroring the
        -- operator: DuckDB's bare CAST rounds to nearest while Spark's
        -- truncates, so the oracle must replay the operator's explicit
        -- half-up coercion, not rely on the engines' cast semantics
        SELECT l_returnflag AS flag, year(l_shipdate) AS yr,
          l_extendedprice AS v,
          CAST(floor(l_quantity + 0.5) AS BIGINT) AS wt,
          l_orderkey AS k1, l_linenumber AS k2
        FROM lineitem),
      c AS (
        SELECT flag, yr, v, wt,
          sum(wt) OVER (PARTITION BY flag, yr ORDER BY v, k1, k2) AS cw
        FROM b),
      t AS (
        SELECT flag, yr, count(*) AS n, CAST(sum(wt) AS BIGINT) AS w_total
        FROM b GROUP BY 1, 2),
      m AS (
        SELECT c.flag, c.yr, min(struct_pack(c := cw, v := v)) AS s
        FROM c JOIN t USING (flag, yr)
        WHERE 2 * cw >= w_total GROUP BY 1, 2)
      SELECT m.flag AS l_returnflag, CAST(m.yr AS INT) AS ship_year,
        t.n, t.w_total,
        CASE WHEN t.w_total = 0 THEN NULL ELSE m.s.v END AS w_median
      FROM m JOIN t USING (flag, yr) ORDER BY 1, 2"""))

  /** Trimmed + winsorized mean order value per priority class
    * ([[Robust.trimmedStats]], 10% per tail) — Tukey's robust pair:
    * what's the central spend when the whale orders and the micro
    * orders are dropped (trimmed) or clamped (winsorized)? Decimal
    * sums, arithmetic tail reconstruction, pround divisions — the
    * oracle replays rank, cut, and both means. */
  val q221TrimmedMean = Q(
    "q221_trimmed_mean",
    (s, d) =>
      Robust.trimmedStats(orders(s, d), Seq("o_orderpriority"),
          col("o_totalprice"), Seq(col("o_orderkey")), trimPct = 10)
        .orderBy(col("o_orderpriority")),
    Some(s"""WITH b AS (
        SELECT o_orderpriority AS pr, round(o_totalprice, 6) AS v,
          o_orderkey AS k
        FROM orders),
      r AS (
        SELECT pr, v,
          row_number() OVER (PARTITION BY pr ORDER BY v, k) AS rn,
          count(*) OVER (PARTITION BY pr) AS n
        FROM b),
      kpt AS (
        SELECT pr, v, n,
          CAST(floor(n * 10 / CAST(100 AS DOUBLE)) AS BIGINT) AS cut
        FROM r WHERE rn > floor(n * 10 / CAST(100 AS DOUBLE))
          AND rn <= n - floor(n * 10 / CAST(100 AS DOUBLE))),
      g AS (
        SELECT pr, min(n) AS n, min(cut) AS n_cut, count(*) AS nk,
          sum(CAST(v AS DECIMAL(28,6))) AS s,
          min(v) AS vlo, max(v) AS vhi
        FROM kpt GROUP BY 1)
      SELECT pr AS o_orderpriority, CAST(n AS BIGINT) AS n, n_cut,
        ${proundSql("CAST(s AS DOUBLE) / nk", 6)} AS trimmed_mean,
        ${proundSql(
          "CAST(s + CAST(vlo AS DECIMAL(28,6)) * n_cut" +
          " + CAST(vhi AS DECIMAL(28,6)) * n_cut AS DOUBLE) / n", 6)}
          AS winsorized_mean
      FROM g ORDER BY 1"""))

  /** Theil–Sen robust daily trend per event_type
    * ([[Robust.theilSen]]) — the median-of-pairwise-slopes line that
    * one anomalous day cannot drag, next to which q138's OLS reads as
    * the fragile baseline. Pairs are series-length bounded; medians
    * pick by rank under a total order; the oracle replays both median
    * selections and the residual pass. */
  val q222TheilSen = Q(
    "q222_theil_sen",
    (s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("y"))
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("1970-01-01"))).as("x"),
          col("y"))
      Robust.theilSen(daily, Seq("event_type"), col("x"), col("y"))
        .orderBy(col("event_type"))
    },
    Some(s"""WITH s AS (
        SELECT event_type,
          CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
          CAST(count(*) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2),
      p AS (
        SELECT a.event_type, a.x AS x1, b.x AS x2,
          (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS m
        FROM s a JOIN s b ON a.event_type = b.event_type AND a.x < b.x),
      pr AS (
        SELECT event_type, m, x1, x2,
          row_number() OVER (PARTITION BY event_type
            ORDER BY m, x1, x2) AS rn,
          count(*) OVER (PARTITION BY event_type) AS cnt
        FROM p),
      sl AS (
        SELECT event_type, sum(m) / count(*) AS slope,
          min(cnt) AS n_pairs
        FROM pr
        WHERE rn = CAST(floor((cnt + 1) / CAST(2 AS DOUBLE)) AS BIGINT)
          OR rn = CAST(floor((cnt + 2) / CAST(2 AS DOUBLE)) AS BIGINT)
        GROUP BY 1),
      rs AS (
        SELECT s.event_type, s.y - sl.slope * s.x AS b, s.x
        FROM s JOIN sl USING (event_type)),
      rr AS (
        SELECT event_type, b,
          row_number() OVER (PARTITION BY event_type ORDER BY b, x) AS rn,
          count(*) OVER (PARTITION BY event_type) AS cnt
        FROM rs),
      ic AS (
        SELECT event_type, sum(b) / count(*) AS icpt,
          min(cnt) AS n_points
        FROM rr
        WHERE rn = CAST(floor((cnt + 1) / CAST(2 AS DOUBLE)) AS BIGINT)
          OR rn = CAST(floor((cnt + 2) / CAST(2 AS DOUBLE)) AS BIGINT)
        GROUP BY 1)
      SELECT sl.event_type, ic.n_points, sl.n_pairs,
        ${proundSql("sl.slope", 9)} AS slope,
        ${proundSql("ic.icpt", 9)} AS intercept
      FROM sl JOIN ic USING (event_type) ORDER BY 1"""))

  /** Data-contract battery over lineitem ([[Contracts.validate]]):
    * four row rules in ONE shared scan, two uniqueness rules, two
    * referential-integrity rules — the Deequ-style suite a production
    * table ships with. The battery is honest about this dataset:
    * (l_orderkey, l_linenumber) is NOT unique here (the tie hazard the
    * verify recipe warns about becomes an explicit red row with its
    * exact violation count), while ranges, flags and both FKs pass.
    * Exact counts, trivially oracled. */
  val q223DataContract = Q(
    "q223_data_contract",
    (s, d) => {
      import Contracts._
      Contracts.validate(lineitem(s, d),
        rowRules = Seq(
          RowRule("qty_in_range", col("l_quantity").between(1, 50)),
          RowRule("disc_in_range", col("l_discount").between(0, 0.1)),
          RowRule("price_positive", col("l_extendedprice") > 0),
          RowRule("flag_valid", col("l_returnflag").isin("A", "N", "R"))),
        uniqueRules = Seq(
          UniqueRule("line_key_unique",
            Seq("l_orderkey", "l_linenumber")),
          UniqueRule("full_line_unique",
            Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))),
        fkRules = Seq(
          FkRule("order_exists", Seq("l_orderkey"),
            orders(s, d), Seq("o_orderkey")),
          FkRule("part_exists", Seq("l_partkey"),
            part(s, d), Seq("p_partkey"))))
        .orderBy(col("rule"))
    },
    Some {
      def rowSql(name: String, pred: String) =
        s"""SELECT '$name' AS rule, 'row' AS kind,
          count(*) AS n_checked,
          CAST(sum(CASE WHEN coalesce($pred, false) THEN 0 ELSE 1 END)
            AS BIGINT) AS n_violations,
          sum(CASE WHEN coalesce($pred, false) THEN 0 ELSE 1 END) = 0
            AS pass
        FROM lineitem"""
      def uniqSql(name: String, cols: String) =
        s"""SELECT '$name' AS rule, 'unique' AS kind,
          CAST(sum(c) AS BIGINT) AS n_checked,
          CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
            AS n_violations,
          sum(CASE WHEN c > 1 THEN c ELSE 0 END) = 0 AS pass
        FROM (SELECT count(*) AS c FROM lineitem GROUP BY $cols)"""
      def fkSql(name: String, key: String, ref: String, refKey: String) =
        s"""SELECT '$name' AS rule, 'fk' AS kind,
          (SELECT count(*) FROM lineitem) AS n_checked,
          (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM $ref r WHERE r.$refKey = l.$key))
            AS n_violations,
          (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM $ref r WHERE r.$refKey = l.$key)) = 0 AS pass"""
      Seq(
        rowSql("qty_in_range", "l_quantity BETWEEN 1 AND 50"),
        rowSql("disc_in_range", "l_discount BETWEEN 0 AND 0.1"),
        rowSql("price_positive", "l_extendedprice > 0"),
        rowSql("flag_valid", "l_returnflag IN ('A', 'N', 'R')"),
        uniqSql("line_key_unique", "l_orderkey, l_linenumber"),
        uniqSql("full_line_unique",
          "l_orderkey, l_linenumber, l_partkey, l_suppkey"),
        fkSql("order_exists", "l_orderkey", "orders", "o_orderkey"),
        fkSql("part_exists", "l_partkey", "part", "p_partkey"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY rule")
    })

  /** Skip-gram training pairs from the q214 walk corpus
    * ([[graft.graph.Graph.skipGrams]], window ±2) — the DeepWalk
    * pipeline's data layer: graph → deterministic walks → (center,
    * context) counts ready for an embedding trainer. The oracle
    * replays the full walk unroll ([[walkStepSql]]) plus the windowed
    * position join; top-100 by (count, pair). */
  val q224SkipGrams = Q(
    "q224_skip_grams",
    (s, d) => {
      val walks = graft.graph.Graph.randomWalks(coOrderEdges(s, d),
        node => node <= 20, walkLen = 8, walksPerSeed = 2)
      graft.graph.Graph.skipGrams(walks, window = 2)
        .orderBy(col("n").desc, col("center"), col("context"))
        .limit(100)
    },
    Some(s"""WITH $coOrderEdgesSql,
      sd AS (SELECT DISTINCT a AS node FROM und WHERE a <= 20),
      wk0 AS MATERIALIZED (
        SELECT CAST(node AS VARCHAR) || '#' || CAST(r.r AS VARCHAR) AS wid,
          node
        FROM sd CROSS JOIN (SELECT unnest([1, 2]) AS r) r),
      ${(1 to 8).map(walkStepSql).mkString(",\n")},
      tr AS (
        ${(0 to 8).map(t =>
          s"SELECT wid, $t AS pos, node FROM wk$t")
          .mkString("\n        UNION ALL ")}),
      tk AS (SELECT wid, pos, CAST(node AS VARCHAR) AS tok FROM tr),
      sg AS (
        SELECT a.tok AS center, b.tok AS context, count(*) AS n
        FROM tk a JOIN tk b ON a.wid = b.wid AND a.pos <> b.pos
          AND abs(a.pos - b.pos) <= 2
        GROUP BY 1, 2)
      SELECT center, context, n FROM sg
      ORDER BY n DESC, center, context LIMIT 100"""))

  /** Precision/recall curve of the SimHash dedup tiers against the
    * edit-verified truth (the q28 → q208 stack turned into an EVAL):
    * for each hamming cutoff 0..6, how many banded candidates survive
    * and what fraction are true near-dups — the operating-point
    * table a dedup pipeline owner reads before picking a threshold.
    * Truth is the verified tier itself (candidate-bounded by
    * construction, as any at-scale truth set is). Exact counts, pround
    * ratios, oracle composes the q208 CTE machinery. */
  val q225DedupPr = Q(
    "q225_dedup_pr_curve",
    (s, d) => {
      import graft.operators.Guards
      val docs = documents(s, d)
      val cand = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 6)
        .localCheckpoint()
      val truth = Dedup.editVerifiedNearDup(docs, "doc_id", "text",
          maxHamming = 6, prefixLen = 256, maxEdits = 40)
        .select(col("id1"), col("id2"), lit(true).as("__ok"))
      val nt = truth.agg(count(lit(1)).as("n_true"))
        .withColumn("__k", Guards.constKey(col("n_true")))
      val flagged = cand.join(truth, Seq("id1", "id2"), "left")
      val cutoffs = s.range(0, 7).select(col("id").cast("int").as("cutoff"))
      cutoffs.join(flagged, col("hamming") <= col("cutoff"))
        .groupBy(col("cutoff"))
        .agg(count(lit(1)).as("n_cand"),
          sum(when(col("__ok"), 1L).otherwise(0L)).as("n_true_pos"))
        .withColumn("__k", Guards.constKey(col("cutoff")))
        .join(broadcast(nt), "__k")
        .select(col("cutoff").as("hamming_cutoff"), col("n_cand"),
          col("n_true_pos"), col("n_true"),
          graft.functions.Exprs.pround(
            col("n_true_pos") / col("n_cand").cast("double"), 6).as("prec"),
          graft.functions.Exprs.pround(
            col("n_true_pos") / col("n_true").cast("double"), 6).as("rec"))
        .orderBy(col("hamming_cutoff"))
    },
    Some(s"""WITH $simhashCandCtes,
      hv AS MATERIALIZED (
        SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(h1, h2)) <= 6),
      pfx AS (SELECT doc_id, substr(n, 1, 256) AS p FROM t),
      tr AS MATERIALIZED (
        SELECT hv.id1, hv.id2 FROM hv
        JOIN pfx a ON a.doc_id = hv.id1 JOIN pfx b ON b.doc_id = hv.id2
        WHERE levenshtein(a.p, b.p) <= 40),
      nt AS (SELECT count(*) AS n_true FROM tr),
      fl AS (
        SELECT hv.*, EXISTS (SELECT 1 FROM tr
          WHERE tr.id1 = hv.id1 AND tr.id2 = hv.id2) AS ok
        FROM hv),
      cu AS (SELECT CAST(unnest(range(0, 7)) AS INT) AS cutoff),
      ag AS (
        SELECT cu.cutoff, count(*) AS n_cand,
          CAST(sum(CASE WHEN fl.ok THEN 1 ELSE 0 END) AS BIGINT)
            AS n_true_pos
        FROM cu JOIN fl ON fl.hamming <= cu.cutoff GROUP BY 1)
      SELECT cutoff AS hamming_cutoff, n_cand, n_true_pos, nt.n_true,
        ${proundSql("n_true_pos / CAST(n_cand AS DOUBLE)", 6)} AS prec,
        ${proundSql("n_true_pos / CAST(nt.n_true AS DOUBLE)", 6)} AS rec
      FROM ag CROSS JOIN nt ORDER BY 1"""))

  /** One-scan Pearson correlation matrix over the lineitem measures
    * ([[Profiler.corrMatrix]]): all six pairs' sufficient statistics
    * ride a single aggregation as decimal-exact sums — the profiling
    * query that answers "which measures move together" without one
    * pass per pair. */
  val q226CorrMatrix = Q(
    "q226_corr_matrix",
    (s, d) =>
      Profiler.corrMatrix(lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("m1"), col("m2")),
    Some {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairSql = cols.combinations(2).toSeq.map { case Seq(a, b) =>
        s"""SELECT '$a' AS m1, '$b' AS m2, count(*) AS n,
          ${proundSql(
            s"""CASE WHEN (count(*) * CAST(sum(CAST(round($a * $a, 9)
                AS DECIMAL(38,9))) AS DOUBLE)
              - CAST(sum(CAST(round($a, 9) AS DECIMAL(38,9))) AS DOUBLE)
                * CAST(sum(CAST(round($a, 9) AS DECIMAL(38,9))) AS DOUBLE))
              * (count(*) * CAST(sum(CAST(round($b * $b, 9)
                AS DECIMAL(38,9))) AS DOUBLE)
              - CAST(sum(CAST(round($b, 9) AS DECIMAL(38,9))) AS DOUBLE)
                * CAST(sum(CAST(round($b, 9) AS DECIMAL(38,9))) AS DOUBLE))
              > 0 THEN
              (count(*) * CAST(sum(CAST(round($a * $b, 9)
                AS DECIMAL(38,9))) AS DOUBLE)
              - CAST(sum(CAST(round($a, 9) AS DECIMAL(38,9))) AS DOUBLE)
                * CAST(sum(CAST(round($b, 9) AS DECIMAL(38,9))) AS DOUBLE))
              / sqrt((count(*) * CAST(sum(CAST(round($a * $a, 9)
                AS DECIMAL(38,9))) AS DOUBLE)
              - CAST(sum(CAST(round($a, 9) AS DECIMAL(38,9))) AS DOUBLE)
                * CAST(sum(CAST(round($a, 9) AS DECIMAL(38,9))) AS DOUBLE))
              * (count(*) * CAST(sum(CAST(round($b * $b, 9)
                AS DECIMAL(38,9))) AS DOUBLE)
              - CAST(sum(CAST(round($b, 9) AS DECIMAL(38,9))) AS DOUBLE)
                * CAST(sum(CAST(round($b, 9) AS DECIMAL(38,9))) AS DOUBLE)))
              END""", 6)} AS corr
        FROM lineitem"""
      }.mkString("\nUNION ALL\n")
      s"SELECT * FROM (\n$pairSql\n) ORDER BY m1, m2"
    })

  /** RAG context assembly: the step between retrieval and the prompt —
    * each probe's top-10 cosine candidates greedily packed in rank
    * order under a 600-token budget, snippets stitched into ONE
    * context string per probe. Budget enforcement is a rank-ordered
    * cumulative token sum (integer-exact) per probe; assembly is the
    * sort-struct collect that every walk/packing query uses. The
    * corpus is touched once, by the retrieval front-end; packing runs
    * on k rows per probe. The oracle replays retrieval (the q26
    * LATERAL), token counts, the cumulative cut and the string
    * stitch — the assembled context hash-matches character for
    * character. */
  val q227RagContext = Q(
    "q227_rag_context",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = embeddings(s, d)
      val cand = Similarity.bruteForceTopK(emb,
        emb.where(col("vec_id") < 3), "vec_id", "embedding", "vec_id",
        k = 10)
      val snip = documents(s, d).select(
        col("doc_id").as("neighbor_id"),
        Text.tokenCount(col("text")).as("n_tok"),
        substring(Text.normalize(col("text")), 1, 80).as("snippet"))
      val w = Window.partitionBy(col("probe_id")).orderBy(col("rank"))
      cand.join(snip, Seq("neighbor_id"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .where(col("cum") <= 600)
        .groupBy(col("probe_id"))
        .agg(count(lit(1)).as("n_passages"), max(col("cum")).as("n_tokens"),
          array_join(transform(array_sort(collect_list(
              struct(col("rank"), col("snippet").as("s")))),
            x => x.getField("s")), " | ").as("context"))
        .orderBy(col("probe_id"))
    },
    Some("""WITH cand AS (
        SELECT p.vec_id AS probe_id, n.rank, n.neighbor_id
        FROM (SELECT vec_id FROM embeddings WHERE vec_id < 3) p,
        LATERAL (
          SELECT c.vec_id AS neighbor_id,
            row_number() OVER (ORDER BY
              list_cosine_similarity(c.embedding::DOUBLE[],
                (SELECT embedding FROM embeddings e
                 WHERE e.vec_id = p.vec_id)::DOUBLE[]) DESC,
              c.vec_id) AS rank
          FROM embeddings c WHERE c.vec_id <> p.vec_id
          ORDER BY rank LIMIT 10) n),
      snip AS (
        SELECT doc_id AS neighbor_id,
          CASE WHEN trim(regexp_replace(lower(text), '\s+', ' ', 'g')) = ''
            OR text IS NULL THEN 0
            ELSE len(string_split(
              trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
          END AS n_tok,
          substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
            1, 80) AS snippet
        FROM documents),
      cm AS (
        SELECT c.probe_id, c.rank, s.n_tok, s.snippet,
          sum(s.n_tok) OVER (PARTITION BY c.probe_id ORDER BY c.rank)
            AS cum
        FROM cand c JOIN snip s USING (neighbor_id))
      SELECT probe_id, count(*) AS n_passages,
        CAST(max(cum) AS BIGINT) AS n_tokens,
        string_agg(snippet, ' | ' ORDER BY rank) AS context
      FROM cm WHERE cum <= 600
      GROUP BY probe_id ORDER BY probe_id"""))

  /** The q197 classifier's linear score over the feature frame, Spark
    * side — weights from the trained fit as literals, the dot product
    * in the oracle's exact association order, z re-gridded at 6 dp
    * like the training rounds. */
  private def logregScoreCol(weights: Seq[Double]): Column =
    round(weights.zipWithIndex.map { case (w, i) =>
      lit(w) * col(s"x${i + 1}")
    }.reduce(_ + _), 6)

  /** The shared oracle prefix for scoring with the TRAINED q197
    * weights: features, zero init, all 8 training rounds, then one
    * scored frame (z, y). */
  private def logregScoredSql: String = {
    val dot = (1 to 5).map(i => s"w.w$i*f.x$i").mkString(" + ")
    s"""$logregFeaturesSql,
      w0 AS (SELECT ${(1 to 5).map(i =>
        s"CAST(0 AS DOUBLE) AS w$i").mkString(", ")},
        CAST(NULL AS DOUBLE) AS loss),
      ${(1 to 8).map(logregRoundSql).mkString(",\n      ")},
      scored AS (
        SELECT round($dot, 6) AS z, CAST(f.y AS BIGINT) AS y
        FROM f CROSS JOIN w8 w)"""
  }

  /** Exact ROC-AUC of the q197 quality classifier
    * ([[Classify.aucExact]]) — the discrimination eval the
    * curated-vs-crawl gate actually answers to: does the trained score
    * rank curated docs above crawl docs, and by how much? Midrank
    * Mann–Whitney, integer until the final pround division; the
    * oracle REPLAYS THE FULL 8-ROUND TRAINING (the q197 CTE chain)
    * and then the rank arithmetic, so weights drift = red row. */
  val q228AucEval = Q(
    "q228_auc_eval",
    (s, d) => {
      val feats = logregFeaturesOf(documents(s, d)).localCheckpoint()
      val fit = LogReg.train(feats, Seq("x1", "x2", "x3", "x4", "x5"),
        "y", rounds = 8, lr = 0.5)
      Classify.aucExact(
        feats.withColumn("__z", logregScoreCol(fit.weights.toSeq)),
        col("__z"), col("y"))
    },
    Some(s"""WITH $logregScoredSql,
      g AS (SELECT z, count(*) AS c, CAST(sum(y) AS BIGINT) AS p
        FROM scored GROUP BY 1),
      cw AS (SELECT *, sum(c) OVER (ORDER BY z) - c AS cb FROM g),
      ag AS (
        SELECT CAST(sum(p) AS BIGINT) AS np,
          CAST(sum(c - p) AS BIGINT) AS nn,
          CAST(sum(p * (2*cb + c + 1)) AS BIGINT) AS s2
        FROM cw)
      SELECT np AS n_pos, nn AS n_neg,
        ${proundSql(
          "CAST(s2 - np*(np + 1) AS DOUBLE) / (CAST(2 AS DOUBLE) * np * nn)",
          6)} AS auc
      FROM ag"""))

  /** Equal-frequency reliability diagram of the q197 classifier
    * ([[Classify.calibrationDeciles]]): mean predicted probability vs
    * observed positive rate per decile — the calibration readout
    * beside q228's discrimination readout. Equal-frequency because
    * this scorer's range is compressed (every prediction lands inside
    * one fixed-width decile — the degenerate diagram
    * [[Classify.calibrationBins]] would draw); deciles by distinct-
    * probability cumulative rank keep ties deterministic. */
  val q229Calibration = Q(
    "q229_calibration",
    (s, d) => {
      val feats = logregFeaturesOf(documents(s, d)).localCheckpoint()
      val fit = LogReg.train(feats, Seq("x1", "x2", "x3", "x4", "x5"),
        "y", rounds = 8, lr = 0.5)
      val z = logregScoreCol(fit.weights.toSeq)
      val p = round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
      Classify.calibrationDeciles(feats.withColumn("__p", p), col("__p"),
          col("y"), bins = 10)
        .orderBy(col("bin"))
    },
    Some(s"""WITH $logregScoredSql,
      pb AS (
        SELECT round(1.0/(1.0 + exp(-z)), 6) AS p, y FROM scored),
      g AS (
        SELECT p, count(*) AS c, CAST(sum(y) AS BIGINT) AS s
        FROM pb GROUP BY 1),
      cw AS (
        SELECT *, sum(c) OVER (ORDER BY p) - c AS cb,
          sum(c) OVER () AS n
        FROM g),
      bn AS (
        SELECT CAST(floor(CAST(cb * 10 AS DOUBLE) / n) AS INT) AS bin,
          p, c, s
        FROM cw)
      SELECT bin, CAST(sum(c) AS BIGINT) AS n,
        ${proundSql(
          "CAST(sum(CAST(p AS DECIMAL(28,6)) * c) AS DOUBLE) / sum(c)", 6)}
          AS mean_pred,
        ${proundSql("CAST(sum(s) AS DOUBLE) / sum(c)", 6)} AS frac_pos
      FROM bn GROUP BY bin ORDER BY bin"""))

  /** TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    * PageRank over the word co-occurrence graph — tokens linked when
    * they appear within 2 positions in a document, undirected, then
    * the exact q123 ranker ([[graft.graph.Graph.pageRank]]) for 6
    * rounds, top-30 words. The graph build is an offset-exploded
    * EQUI-join on (doc_id, position) — never a windowless self-join —
    * and the ranker inherits the whole decimal-determinism regime, so
    * the oracle is the q123 unroll ([[pageRankRoundSql]]) over a
    * token-derived edge set. The graph machinery powering an NLP
    * primitive is the point: one operator family, two domains. */
  val q230Textrank = Q(
    "q230_textrank",
    (s, d) => {
      val toks = documents(s, d).select(col("doc_id"),
        posexplode(Text.tokens(col("text"))).as(Seq("pos", "tok")))
      val a = toks.select(col("doc_id"),
          explode(array(lit(1), lit(2))).as("o"), col("pos"), col("tok"))
        .select(col("doc_id"), (col("pos") + col("o")).as("p2"),
          col("tok").as("ta"))
      val b = toks.select(col("doc_id"), col("pos").as("p2"),
        col("tok").as("tb"))
      val pairs = a.join(b, Seq("doc_id", "p2"))
        .where(col("ta") =!= col("tb"))
        .select(col("ta"), col("tb"))
      val edges = pairs.select(col("ta").as("src"), col("tb").as("dst"))
        .unionByName(pairs.select(col("tb").as("src"), col("ta").as("dst")))
      graft.graph.Graph.pageRank(edges, iterations = 6)
        .orderBy(col("rank").desc, col("node"))
        .limit(30)
        .select(col("node").as("word"), round(col("rank"), 12).as("rank"))
    },
    Some(s"""WITH t AS ($duckToksSql),
      c AS (
        SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks
        FROM t WHERE len(toks) > 0),
      tk AS (SELECT doc_id, pos, toks[pos + 1] AS tok FROM c),
      pr0 AS (
        SELECT a.tok AS ta, b.tok AS tb
        FROM tk a JOIN tk b ON a.doc_id = b.doc_id
          AND (b.pos = a.pos + 1 OR b.pos = a.pos + 2)
        WHERE a.tok <> b.tok),
      e AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT ta AS src, tb AS dst FROM pr0
          UNION ALL SELECT tb, ta FROM pr0)),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      deg AS (SELECT src AS node, count(*) AS outdeg FROM e GROUP BY 1),
      m AS (SELECT count(*) AS n FROM nodes),
      s0 AS MATERIALIZED (
        SELECT nd.node, dg.outdeg, m.n,
          round(CAST(1.0 AS DOUBLE) / m.n, 12) AS rank
        FROM nodes nd LEFT JOIN deg dg USING (node) CROSS JOIN m),
      ${(1 to 6).map(k => pageRankRoundSql(s"s${k - 1}", k)).mkString(",\n")}
      SELECT node AS word, rank FROM s6
      ORDER BY rank DESC, node LIMIT 30"""))

  /** Point-in-time snapshots over the q152 SCD2 intervals — the time
    * travel readout a bitemporal dimension exists for: "who was in
    * which state at T?" for three weekly cut points. The as-of spine
    * is EXPLODED onto the interval rows (map-side, three literals —
    * no join of any kind), then one filter + keyed count per
    * snapshot; the oracle replays the run-collapse and the interval
    * containment. */
  val q231Snapshot = Q(
    "q231_scd2_snapshot",
    (s, d) => {
      val ev = events(s, d)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("timestamp"), col("event_id"))
      val intervals = ev
        .withColumn("__prev", lag(col("event_type"), 1).over(w))
        .where(col("__prev").isNull || col("__prev") =!= col("event_type"))
        .withColumn("valid_to", lead(col("ts").cast("timestamp"), 1).over(w))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts").cast("timestamp").as("valid_from"), col("valid_to"))
      val snaps = Seq("2024-01-08 00:00:00", "2024-01-15 00:00:00",
        "2024-01-22 00:00:00")
      intervals
        .withColumn("as_of",
          explode(array(snaps.map(x => lit(x).cast("timestamp")): _*)))
        .where(col("valid_from") <= col("as_of") &&
          (col("valid_to").isNull || col("valid_to") > col("as_of")))
        .groupBy(col("as_of"), col("state"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("as_of"), col("state"))
    },
    Some("""WITH ch AS (
        SELECT user_id, event_type AS state, ts, event_id,
          lag(event_type) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      runs AS (
        SELECT user_id, state, ts AS valid_from,
          lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS valid_to
        FROM ch WHERE prev IS NULL OR prev <> state),
      sp AS (SELECT unnest([TIMESTAMP '2024-01-08 00:00:00',
        TIMESTAMP '2024-01-15 00:00:00',
        TIMESTAMP '2024-01-22 00:00:00']) AS as_of)
      SELECT sp.as_of, r.state,
        CAST(count(DISTINCT r.user_id) AS BIGINT) AS n_users
      FROM runs r CROSS JOIN sp
      WHERE r.valid_from <= sp.as_of
        AND (r.valid_to IS NULL OR r.valid_to > sp.as_of)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** The cluster deployment shape, composed (r08 verdict item 2): the
    * convergence-stopped ranker ([[graft.graph.Graph.pageRankConverged]],
    * q182's contract) run over the ONE-TIME src-bucketed edge layout
    * (q179's contract) — every probed round joins the bucketed scan with
    * zero edge-side exchanges AND the loop stops at the data-dependent
    * L1 fixed point instead of a pinned count. Same tol/maxIter as q182
    * and the staged table IS q182's deduped edge set, so ranks, round
    * count and stop delta must hash-match q182's gated-unroll oracle
    * bit-for-bit — the correctness proof that the two mechanisms
    * compose without interfering (GraphClusterPlanSpec locks the
    * per-round plan edge-exchange-free under the converged transport). */
  val q232PagerankTolBucketed = Q(
    "q232_pagerank_tol_bucketed",
    (s, d) => {
      graft.graph.Graph.pageRankConverged(
          s.table(stagedBucketedEdges(s, d)), tol = 0.02, maxIter = 30,
          edgesPrepared = true)
        .where(col("node").startsWith("s"))
        .orderBy(col("rank").desc, col("node"))
        .limit(30)
        .select(col("node"), round(col("rank"), 12).as("rank"),
          col("iters"), col("l1_delta"))
    },
    q182PagerankTol.oracle)

  /** The weighted-quantile SKETCH under the oracle gate — the 100 TB
    * swap [[Robust.weightedMedian]]'s doc promises
    * ([[Sketches.weightedBottomK]], priority sampling): quantity-
    * weighted price quantiles from a k=1024 sample instead of a
    * per-group sort of the data, with the q181 accuracy-readout
    * discipline — each estimate's REALIZED weight-rank in the full
    * data rides the hash gate next to a |rank − q| ≤ 0.05 bound
    * boolean, so the driver verifies both the replayed sketch AND
    * that its error is inside the envelope. Every arithmetic step
    * (md5 uniform, priority division, τ threshold, HT-adjusted
    * decimal cumsum) is exact-or-identical-IEEE on both engines, so
    * the oracle replays the sketch bit-for-bit. */
  val q233WeightedQuantileSketch = Q(
    "q233_weighted_quantile_sketch",
    (s, d) => {
      val li = lineitem(s, d)
      val id = concat(col("l_orderkey"), lit("_"), col("l_linenumber"))
      val k = 1024
      val sample = Sketches.weightedBottomK(li, id,
        col("l_extendedprice"), col("l_quantity"), k, seed = 7)
      val est = Sketches.weightedSampleQuantiles(sample, k,
          Seq(0.25, 0.5, 0.75, 0.9))
        .withColumn("__k", Guards.constKey(col("q")))
      val wt = floor(col("l_quantity").cast("double") + lit(0.5d))
        .cast("long")
      li.select(col("l_extendedprice").as("__v"), wt.as("__wt"))
        .withColumn("__k", Guards.constKey(col("__v")))
        .join(broadcast(est), "__k")
        .groupBy(col("q"))
        .agg(first(col("est")).as("est"),
          first(col("n_sample")).as("n_sample"),
          first(col("w_est")).as("w_est"),
          Exprs.pround(
            sum(when(col("__v") <= col("est"), col("__wt"))).cast("double")
              / sum(col("__wt")).cast("double"), 6).as("exact_rank"))
        .select(col("q"), col("est"), col("n_sample"), col("w_est"),
          col("exact_rank"),
          (abs(col("exact_rank") - col("q")) <= lit(0.05))
            .as("within_bound"))
        .orderBy(col("q"))
    },
    Some(s"""WITH ids AS MATERIALIZED (
        SELECT l_extendedprice AS v, CAST(l_quantity AS DOUBLE) AS w,
          ('0x' || substr(md5('7:' || (CAST(l_orderkey AS VARCHAR)
            || '_' || CAST(l_linenumber AS VARCHAR))), 1, 15))::BIGINT AS h
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND l_quantity IS NOT NULL AND l_quantity > 0),
      topk AS MATERIALIZED (
        SELECT v, w, h,
          w / (CAST(h % 9007199254740992 + 1 AS DOUBLE)
            / CAST(9007199254740992 AS DOUBLE)) AS p
        FROM ids
        QUALIFY row_number() OVER (ORDER BY p DESC, h, v) <= 1025),
      rk AS (
        SELECT v, w, h, p,
          row_number() OVER (ORDER BY p DESC, h, v) AS rk
        FROM topk),
      tau AS (
        SELECT coalesce(max(CASE WHEN rk = 1025 THEN p END),
          CAST(0 AS DOUBLE)) AS tau
        FROM rk),
      aw AS (
        SELECT v, h,
          CAST(${proundSql("greatest(w, t.tau)", 6)}
            AS DECIMAL(28,6)) AS aw
        FROM rk CROSS JOIN tau t WHERE rk <= 1024),
      cum AS (
        SELECT v, sum(aw) OVER (ORDER BY v, h) AS cw,
          sum(aw) OVER () AS tw, count(*) OVER () AS ns
        FROM aw),
      qs AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        CAST(0.75 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS q),
      est AS (
        SELECT qs.q, min(c.v) AS est,
          CAST(max(c.ns) AS BIGINT) AS n_sample,
          CAST(max(c.tw) AS DOUBLE) AS w_est
        FROM qs JOIN cum c
          ON CAST(c.cw AS DOUBLE) >= qs.q * CAST(c.tw AS DOUBLE)
        GROUP BY qs.q),
      wtd AS (
        SELECT l_extendedprice AS v,
          CAST(floor(l_quantity + 0.5) AS BIGINT) AS wt
        FROM lineitem),
      fin AS (
        SELECT e.q, e.est, e.n_sample, e.w_est,
          ${proundSql(
            "CAST((SELECT sum(wt) FROM wtd WHERE wtd.v <= e.est)" +
            " AS DOUBLE) / (SELECT CAST(sum(wt) AS DOUBLE) FROM wtd)",
            6)} AS exact_rank
        FROM est e)
      SELECT q, est, n_sample, w_est, exact_rank,
        abs(exact_rank - q) <= CAST(0.05 AS DOUBLE) AS within_bound
      FROM fin ORDER BY q"""))

  /** Nation-contracted co-supply graph: nations a<b linked when the
    * count of orders containing suppliers of both exceeds the average
    * pair count — at MOST 25 nodes at ANY scale factor (the dimension
    * table is the bound), which makes exact all-sources ground truth
    * affordable forever: this is the testbed the sampled-estimator
    * accuracy gates (q234/q235) run on. Undirected (both directions
    * emitted). */
  private def nationCoSupplyEdges(s: SparkSession, d: String): DataFrame = {
    val nl = lineitem(s, d)
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey").as("ok"), col("s_nationkey").as("n"))
      .distinct()
    val pairs = nl.join(nl.withColumnRenamed("n", "n2"), "ok")
      .where(col("n") < col("n2"))
      .groupBy(col("n").as("a"), col("n2").as("b"))
      .agg(count(lit(1)).as("co"))
    val thr = pairs.agg(avg(col("co")).as("m"))
      .withColumn("__k", Guards.constKey(col("m")))
    val e = pairs.withColumn("__k", Guards.constKey(col("a")))
      .join(broadcast(thr), "__k")
      .where(col("co") > col("m"))
      .select(col("a"), col("b"))
    e.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e.select(col("b").as("src"), col("a").as("dst")))
  }

  /** [[nationCoSupplyEdges]] as oracle CTEs ending in `ue` — the edge
    * CTE name [[betwForwardSql]]/[[betwBackwardSql]] expect. */
  private val nationEdgeSql = """nl AS MATERIALIZED (
        SELECT DISTINCT l.l_orderkey AS ok, s.s_nationkey AS n
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      np AS (
        SELECT x.n AS a, y.n AS b, count(*) AS co
        FROM nl x JOIN nl y ON x.ok = y.ok AND x.n < y.n
        GROUP BY 1, 2),
      nthr AS (SELECT avg(co) AS m FROM np),
      ned AS MATERIALIZED (SELECT a, b FROM np, nthr WHERE co > m),
      ue AS MATERIALIZED (
        SELECT a AS src, b AS dst FROM ned
        UNION ALL SELECT b, a FROM ned)"""

  /** Gate-level accuracy readout for SAMPLED closeness (the q181
    * recall-gate discipline applied to the topology tier, r08 verdict
    * item 6): on the size-bounded nation graph, ONE [[Graph.ssspPerSeed]]
    * run from ALL sources yields both the exact per-node mean hop
    * distance and the q194-style sampled estimate (seeds = nationkey %
    * 3, the fixed-size Eppstein–Wang sample), and the |est − exact| ≤
    * 0.5-hop bound boolean rides the hash gate per node — the driver
    * now verifies the ESTIMATOR'S ERROR, not just that the sampled
    * arithmetic replays. Measured max error 0.25 hops across all three
    * SFs; the bound is 2× that. */
  val q234ClosenessAccuracy = Q(
    "q234_closeness_accuracy",
    (s, d) => {
      val e = nationCoSupplyEdges(s, d).withColumn("w", lit(1L))
      val dists = graft.graph.Graph.ssspPerSeed(e, _ => lit(true),
          maxIter = 8)
        .where(col("seed") =!= col("node"))
        .localCheckpoint()
      val exact = dists.groupBy("node")
        .agg(count(lit(1)).as("n_seeds_exact"),
          sum("dist").as("farness_exact"))
      val sampled = dists.where(col("seed") % 3 === 0)
        .groupBy("node")
        .agg(count(lit(1)).as("n_seeds_sample"),
          sum("dist").as("farness_sample"))
      exact.join(sampled, Seq("node"), "left")
        .select(col("node"), col("n_seeds_exact"),
          coalesce(col("n_seeds_sample"), lit(0L)).as("n_seeds_sample"),
          Exprs.pround(col("farness_exact").cast("double")
            / col("n_seeds_exact"), 6).as("exact_avg_dist"),
          Exprs.pround(col("farness_sample").cast("double")
            / col("n_seeds_sample"), 6).as("est_avg_dist"))
        .withColumn("abs_err",
          Exprs.pround(abs(col("est_avg_dist") - col("exact_avg_dist")), 6))
        .withColumn("within_bound",
          coalesce(col("abs_err") <= lit(0.5), lit(false)))
        .orderBy(col("node"))
    },
    Some {
      val rounds = (1 to 8).map { r =>
        s"""c$r AS MATERIALIZED (
          SELECT seed, node, min(dist) AS dist FROM (
            SELECT seed, node, dist FROM c${r - 1}
            UNION ALL
            SELECT s.seed, e.dst AS node, s.dist + 1 AS dist
            FROM c${r - 1} s JOIN ue e ON s.node = e.src)
          GROUP BY 1, 2)"""
      }.mkString(",\n      ")
      s"""WITH $nationEdgeSql,
      c0 AS MATERIALIZED (
        SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist
        FROM (SELECT DISTINCT src AS node FROM ue)),
      $rounds,
      dm AS (SELECT * FROM c8 WHERE seed <> node),
      ex AS (
        SELECT node, count(*) AS n_seeds_exact,
          CAST(sum(dist) AS BIGINT) AS farness_exact
        FROM dm GROUP BY 1),
      sa AS (
        SELECT node, count(*) AS n_seeds_sample,
          CAST(sum(dist) AS BIGINT) AS farness_sample
        FROM dm WHERE seed % 3 = 0 GROUP BY 1),
      pn AS (
        SELECT ex.node, ex.n_seeds_exact,
          coalesce(sa.n_seeds_sample, 0) AS n_seeds_sample,
          ${proundSql(
            "CAST(ex.farness_exact AS DOUBLE) / ex.n_seeds_exact", 6)}
            AS exact_avg_dist,
          ${proundSql(
            "CAST(sa.farness_sample AS DOUBLE) / sa.n_seeds_sample", 6)}
            AS est_avg_dist
        FROM ex LEFT JOIN sa USING (node))
      SELECT node, n_seeds_exact, n_seeds_sample, exact_avg_dist,
        est_avg_dist,
        ${proundSql("abs(est_avg_dist - exact_avg_dist)", 6)} AS abs_err,
        coalesce(${proundSql("abs(est_avg_dist - exact_avg_dist)", 6)}
          <= CAST(0.5 AS DOUBLE), false) AS within_bound
      FROM pn ORDER BY node"""
    })

  /** Gate-level accuracy readout for SAMPLED betweenness (q235 is to
    * q199 what q234 is to q194): exact hop-capped Brandes from ALL
    * sources vs the q199 sampled run scaled by n/k (Brandes & Pich
    * 2007 pivot unbiasing), summarized as a normalized L1 error with
    * its ≤ 0.5 bound boolean through the hash gate. Both runs are the
    * SAME operator ([[graft.graph.Graph.betweennessSampled]]) — per-
    * seed dependencies are independent, so the oracle replays one
    * all-sources unroll and restricts the seed sum, proving the two
    * engine runs AND the estimator's error in one hash. Measured
    * rel_l1 0.04–0.26 across the three SFs; the bound is ~2× the max. */
  val q235BetweennessAccuracy = Q(
    "q235_betweenness_accuracy",
    (s, d) => {
      val e = nationCoSupplyEdges(s, d)
      val exact = graft.graph.Graph.betweennessSampled(e,
          _ => lit(true), maxHops = 6)
        .withColumnRenamed("betweenness", "bc_exact")
      val sampled = graft.graph.Graph.betweennessSampled(e,
          n => n % 3 === 0, maxHops = 6)
        .withColumnRenamed("betweenness", "bc_sample")
      val counts = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct()
        .agg(count(lit(1)).as("n_nodes"),
          sum(when(col("node") % 3 === 0, 1L).otherwise(0L)).as("k_seeds"))
        .withColumn("__k", Guards.constKey(col("n_nodes")))
      exact.join(sampled, Seq("node"), "left")
        .withColumn("__k", Guards.constKey(col("node")))
        .join(broadcast(counts), "__k")
        .withColumn("bc_sample", coalesce(col("bc_sample"), lit(0.0)))
        .withColumn("bc_est", Exprs.pround(col("bc_sample") *
          (col("n_nodes").cast("double") / col("k_seeds").cast("double")),
          6))
        .groupBy("n_nodes", "k_seeds")
        .agg(count(lit(1)).as("n_scored"),
          sum(col("bc_exact").cast("decimal(38,6)")).cast("double")
            .as("total_bc_exact"),
          sum(col("bc_est").cast("decimal(38,6)")).cast("double")
            .as("total_bc_est"),
          sum(abs(col("bc_est") - col("bc_exact")).cast("decimal(38,6)"))
            .cast("double").as("l1_err"))
        .withColumn("rel_l1",
          Exprs.pround(col("l1_err") / col("total_bc_exact"), 6))
        .withColumn("within_bound", col("rel_l1") <= lit(0.5))
        .select(col("n_nodes"), col("k_seeds"), col("n_scored"),
          col("total_bc_exact"), col("total_bc_est"), col("l1_err"),
          col("rel_l1"), col("within_bound"))
    },
    Some {
      val maxHops = 6
      val fwd = (1 to maxHops).map(betwForwardSql).mkString(",\n      ")
      val bwd = (maxHops - 1 to 1 by -1).map(betwBackwardSql)
        .mkString(",\n      ")
      s"""WITH $nationEdgeSql,
      b0 AS MATERIALIZED (
        SELECT node AS seed, node, 0 AS hop, CAST(1 AS BIGINT) AS sigma
        FROM (SELECT DISTINCT src AS node FROM ue)),
      $fwd,
      dd$maxHops AS MATERIALIZED (
        SELECT seed, node, hop, sigma, CAST(0 AS DOUBLE) AS delta
        FROM b$maxHops),
      $bwd,
      bc AS (
        SELECT node,
          round(CAST(sum(CAST(round(delta, 12) AS DECIMAL(38,12)))
            AS DOUBLE), 6) AS bc_exact,
          round(CAST(coalesce(sum(CAST(round(delta, 12) AS DECIMAL(38,12)))
            FILTER (WHERE seed % 3 = 0), 0) AS DOUBLE), 6) AS bc_sample
        FROM dd1 WHERE hop > 0 GROUP BY node),
      cnt AS (
        SELECT count(*) AS n_nodes,
          sum(CASE WHEN node % 3 = 0 THEN 1 ELSE 0 END) AS k_seeds
        FROM (SELECT DISTINCT src AS node FROM ue)),
      pn AS (
        SELECT b.node, b.bc_exact,
          ${proundSql("b.bc_sample * (CAST(c.n_nodes AS DOUBLE)" +
            " / CAST(c.k_seeds AS DOUBLE))", 6)} AS bc_est
        FROM bc b CROSS JOIN cnt c
        WHERE b.bc_exact > 0),
      ag AS (
        SELECT CAST(c.n_nodes AS BIGINT) AS n_nodes,
          CAST(c.k_seeds AS BIGINT) AS k_seeds,
          CAST(count(*) AS BIGINT) AS n_scored,
          CAST(sum(CAST(bc_exact AS DECIMAL(38,6))) AS DOUBLE)
            AS total_bc_exact,
          CAST(sum(CAST(bc_est AS DECIMAL(38,6))) AS DOUBLE)
            AS total_bc_est,
          CAST(sum(CAST(abs(bc_est - bc_exact) AS DECIMAL(38,6)))
            AS DOUBLE) AS l1_err
        FROM pn CROSS JOIN cnt c GROUP BY 1, 2)
      SELECT n_nodes, k_seeds, n_scored, total_bc_exact, total_bc_est,
        l1_err, ${proundSql("l1_err / total_bc_exact", 6)} AS rel_l1,
        ${proundSql("l1_err / total_bc_exact", 6)}
          <= CAST(0.5 AS DOUBLE) AS within_bound
      FROM ag"""
    })

  /** Hard-negative mining for contrastive training (the data layer of
    * DPR/SimCSE-style retrieval training — Karpukhin et al. 2020 use
    * exactly this shape: negatives that LOOK like positives): per
    * probe, retrieve a wide LSH candidate set (q29's bucketed path,
    * k=25), anti-join away the brute-force TRUE top-5 (q26's ground
    * truth), and keep the 5 highest-cosine survivors — the
    * look-alike non-neighbors a contrastive loss learns the most
    * from. Pure composition of already-oracled operators: one
    * bucket-bounded retrieval, one probe-bounded anti-join, one
    * probe-keyed window — nothing quadratic in corpus size, and the
    * oracle splices the two constituent SQL chains. */
  val q236HardNegatives = Q(
    "q236_hard_negatives",
    (s, d) => {
      val emb = embeddings(s, d)
      val probes = emb.where(col("vec_id") < 10)
      val truth = Similarity.bruteForceTopK(emb, probes,
          "vec_id", "embedding", "vec_id", k = 5)
        .select(col("probe_id"), col("neighbor_id"))
      val cands = Similarity.lshTopK(emb, probes,
        "vec_id", "embedding", "vec_id", k = 25, planes = 4, dims = 64)
      cands.join(truth, Seq("probe_id", "neighbor_id"), "left_anti")
        .withColumn("neg_rank", row_number().over(
          Window.partitionBy(col("probe_id"))
            .orderBy(col("cos").desc, col("neighbor_id"))))
        .where(col("neg_rank") <= 5)
        .select(col("probe_id"), col("neg_rank"), col("neighbor_id"),
          col("cos"))
        .orderBy(col("probe_id"), col("neg_rank"))
    },
    Some {
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      b AS (
        SELECT vec_id, e,
          ${duckBucketExpr(4, 64, "e")} AS bucket
        FROM v),
      pr AS (SELECT vec_id AS probe_id, e AS pe, bucket
             FROM b WHERE vec_id < 10),
      sc AS (
        SELECT pr.probe_id, c.vec_id AS neighbor_id,
          list_cosine_similarity(c.e, pr.pe) AS cosf
        FROM b c JOIN pr ON c.bucket = pr.bucket AND c.vec_id <> pr.probe_id),
      rk AS (
        SELECT probe_id, neighbor_id, cosf,
          row_number() OVER (PARTITION BY probe_id
            ORDER BY cosf DESC, neighbor_id) AS rank
        FROM sc),
      truth AS (
        SELECT p.vec_id AS probe_id, n.neighbor_id
        FROM (SELECT vec_id FROM embeddings WHERE vec_id < 10) p,
        LATERAL (
          SELECT c.vec_id AS neighbor_id,
            row_number() OVER (ORDER BY
              list_cosine_similarity(c.embedding::DOUBLE[],
                (SELECT embedding FROM embeddings e
                 WHERE e.vec_id = p.vec_id)::DOUBLE[]) DESC,
              c.vec_id) AS rank
          FROM embeddings c WHERE c.vec_id <> p.vec_id
          ORDER BY rank LIMIT 5) n),
      neg AS (
        SELECT r.probe_id, r.neighbor_id, round(r.cosf, 6) AS cos
        FROM rk r
        WHERE r.rank <= 25 AND NOT EXISTS (
          SELECT 1 FROM truth t
          WHERE t.probe_id = r.probe_id
            AND t.neighbor_id = r.neighbor_id))
      SELECT probe_id, neg_rank, neighbor_id, cos FROM (
        SELECT probe_id, neighbor_id, cos,
          row_number() OVER (PARTITION BY probe_id
            ORDER BY cos DESC, neighbor_id) AS neg_rank
        FROM neg)
      WHERE neg_rank <= 5
      ORDER BY probe_id, neg_rank"""
    })

  /** The KEYED weighted-quantile sketch beside its exact tier — q220's
    * per-(returnflag, ship-year) weighted median computed BOTH ways in
    * one gate: the exact cumulative-window tier
    * ([[Robust.weightedMedian]]) and the bounded-state sketch
    * ([[Sketches.weightedBottomKByKey]], the native `graft_wbk`
    * aggregate whose partial states hold ≤ k+1 rows per group — at
    * 100 TB the exchange ships the sketch, never the group). Each
    * group's sketch estimate carries its realized in-group weight rank
    * with a |rank − 0.5| ≤ 0.1 bound boolean through the hash gate
    * (k = 256 → DKW ε ≈ 0.085 at 95 %; groups the sample exhausts are
    * exact by the τ = 0 degeneration). */
  val q237WeightedMedianKeyed = Q(
    "q237_weighted_median_sketch_keyed",
    (s, d) => {
      val li = lineitem(s, d).select(col("l_returnflag"),
        year(col("l_shipdate")).as("ship_year"), col("l_extendedprice"),
        col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val keys = Seq("l_returnflag", "ship_year")
      val exact = Robust.weightedMedian(li, keys, col("l_extendedprice"),
        col("l_quantity"), Seq(col("l_orderkey"), col("l_linenumber")))
      val id = concat(col("l_orderkey"), lit("_"), col("l_linenumber"))
      val sample = Sketches.weightedBottomKByKey(li, keys, id,
        col("l_extendedprice"), col("l_quantity"), k = 256, seed = 7)
      val est = Sketches.weightedKeyedQuantiles(sample, keys, 256, Seq(0.5))
        .select(col("l_returnflag"), col("ship_year"), col("est"),
          col("n_sample"))
      val wt = floor(col("l_quantity").cast("double") + lit(0.5d))
        .cast("long")
      val ranks = li.select(col("l_returnflag"), col("ship_year"),
          col("l_extendedprice").as("__v"), wt.as("__wt"))
        .join(broadcast(est), keys)
        .groupBy(keys.map(col): _*)
        .agg(first(col("est")).as("est"),
          first(col("n_sample")).as("n_sample"),
          Exprs.pround(
            sum(when(col("__v") <= col("est"), col("__wt"))).cast("double")
              / sum(col("__wt")).cast("double"), 6).as("rank_of_est"))
      exact.join(ranks, keys)
        .select(col("l_returnflag"), col("ship_year"), col("n"),
          col("w_total"), col("w_median"), col("est"), col("n_sample"),
          col("rank_of_est"),
          (abs(col("rank_of_est") - lit(0.5)) <= lit(0.1))
            .as("within_bound"))
        .orderBy(col("l_returnflag"), col("ship_year"))
    },
    Some(s"""WITH b AS MATERIALIZED (
        SELECT l_returnflag AS flag, year(l_shipdate) AS yr,
          l_extendedprice AS v,
          CAST(floor(l_quantity + 0.5) AS BIGINT) AS wt,
          l_orderkey AS k1, l_linenumber AS k2
        FROM lineitem),
      c AS (
        SELECT flag, yr, v, wt,
          sum(wt) OVER (PARTITION BY flag, yr ORDER BY v, k1, k2) AS cw
        FROM b),
      t AS (
        SELECT flag, yr, count(*) AS n, CAST(sum(wt) AS BIGINT) AS w_total
        FROM b GROUP BY 1, 2),
      m AS (
        SELECT c.flag, c.yr, min(struct_pack(c := cw, v := v)) AS s
        FROM c JOIN t USING (flag, yr)
        WHERE 2 * cw >= w_total GROUP BY 1, 2),
      ids AS MATERIALIZED (
        SELECT l_returnflag AS flag, year(l_shipdate) AS yr,
          l_extendedprice AS v, CAST(l_quantity AS DOUBLE) AS w,
          ('0x' || substr(md5('7:' || (CAST(l_orderkey AS VARCHAR)
            || '_' || CAST(l_linenumber AS VARCHAR))), 1, 15))::BIGINT AS h
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL
          AND l_quantity IS NOT NULL AND l_quantity > 0),
      topk AS MATERIALIZED (
        SELECT flag, yr, v, w, h,
          w / (CAST(h % 9007199254740992 + 1 AS DOUBLE)
            / CAST(9007199254740992 AS DOUBLE)) AS p
        FROM ids
        QUALIFY row_number() OVER (PARTITION BY flag, yr
          ORDER BY p DESC, h, v) <= 257),
      rk AS (
        SELECT *, row_number() OVER (PARTITION BY flag, yr
          ORDER BY p DESC, h, v) AS rk
        FROM topk),
      tau AS (
        SELECT flag, yr,
          coalesce(max(CASE WHEN rk = 257 THEN p END),
            CAST(0 AS DOUBLE)) AS tau
        FROM rk GROUP BY 1, 2),
      aw AS (
        SELECT r.flag, r.yr, r.v, r.h,
          CAST(${proundSql("greatest(r.w, t.tau)", 6)}
            AS DECIMAL(28,6)) AS aw
        FROM rk r JOIN tau t USING (flag, yr) WHERE r.rk <= 256),
      cum AS (
        SELECT flag, yr, v,
          sum(aw) OVER (PARTITION BY flag, yr ORDER BY v, h) AS cw2,
          sum(aw) OVER (PARTITION BY flag, yr) AS tw,
          count(*) OVER (PARTITION BY flag, yr) AS ns
        FROM aw),
      es AS (
        SELECT flag, yr, min(v) AS est, CAST(max(ns) AS BIGINT) AS n_sample
        FROM cum
        WHERE CAST(cw2 AS DOUBLE) >= CAST(0.5 AS DOUBLE) * CAST(tw AS DOUBLE)
        GROUP BY 1, 2),
      rnk AS (
        SELECT b.flag, b.yr,
          ${proundSql(
            "CAST(sum(CASE WHEN b.v <= es.est THEN b.wt ELSE 0 END)" +
            " AS DOUBLE) / CAST(sum(b.wt) AS DOUBLE)", 6)} AS rank_of_est
        FROM b JOIN es USING (flag, yr) GROUP BY 1, 2)
      SELECT m.flag AS l_returnflag, CAST(m.yr AS INT) AS ship_year,
        t.n, t.w_total,
        CASE WHEN t.w_total = 0 THEN NULL ELSE m.s.v END AS w_median,
        es.est, es.n_sample, rnk.rank_of_est,
        abs(rnk.rank_of_est - CAST(0.5 AS DOUBLE)) <= CAST(0.1 AS DOUBLE)
          AS within_bound
      FROM m JOIN t USING (flag, yr)
      JOIN es ON es.flag = m.flag AND es.yr = m.yr
      JOIN rnk ON rnk.flag = m.flag AND rnk.yr = m.yr
      ORDER BY 1, 2"""))

  /** All queries in catalog order. */
  def all: Seq[Q] = Seq(
    q01RuleaggBasic, q02RuleaggWeighted, q03Join3way, q04IntervalJoin,
    q05AsofJoin, q06Headway, q07Sessionize, q08Runtime, q09Cumload,
    q10Weighting, q11Impute, q12Interp, q13Ffill, q14Pivot, q15Melt,
    q16CrosstabTotals, q17Topk, q18ServiceDay, q19Fiscal, q20CpiDeflate,
    q21DedupExact, q22LangId, q23Quality, q24Tokens, q25Jaccard, q26Knn,
    q27MinhashLsh, q28Simhash, q29AnnLsh, q30TripSegmentation,
    q31TransformWindow, q32LeftAnti, q33UnionSeries, q34Percentile,
    q35FixedWidth, q36GridNn, q37BfsHops, q38BinaryMeta,
    q39MultimodalFeatures, q40Viterbi, q41LccDistance, q42AggCascade,
    q43PerfMeasures, q44EmbeddingNeardup, q45SequenceChain, q46GlobIngest,
    q47TabVariant, q48Gtfs, q49TransitPipeline, q50LinkedTrips,
    q51ReportAssembly, q52TodBucket, q53Sketches, q54Reconstruct,
    q55TripIdDisambig, q56Allocation, q57DemandAssembly, q58SkimProbe,
    q59SetOps, q60BpeTokens, q61Winnow, q62Centroids, q63Quantize,
    q64JsonProps, q65SqlInterface, q66EstimationFile, q67RatioExtrapolation,
    q68TaxiSegmentation, q69MapMatching, q70LinkTtStats, q71GtfsDaily,
    q72GtfsMonthly, q73MasterRoute, q74AnnualToMonthly, q75MonthImpute,
    q76PartitionedSink, q77ModeLookup, q78DedupComponents,
    q79SequencePacking, q80StratifiedSample, q81IvfAnn, q82Repetition,
    q83NetworkIngest, q84FrameSample, q85PiiRedact, q86DedupSweep,
    q87Chunking, q88Contamination, q89VocabOov, q90IntervalBucketed,
    q91SaltedJoin, q92ComponentsStar, q93Kmeans, q94SourceMix,
    q95CorpusShuffle, q96SemDedup, q97WorkbookCpi, q98ContaminationHashed,
    q99BucketedJoin, q100Bm25, q101IncrementalDedup, q102LengthHistogram,
    q103HashSplit, q104TopPerLang, q105SpanDedup, q106TrajectorySim,
    q107PrefixJaccard, q108Resize, q109AnnMultiprobe, q110MovementSkim,
    q111OdCrosswalk, q112StpRegistry, q113RuleaggMeantime,
    q114ViterbiPosteriors, q115LmPerplexity, q116DsirWeights,
    q117GopherRules, q118ZipperPack, q119PqAdc, q120IvfPq, q121SourceCap,
    q122CurationSweep, q123PageRank, q124WeightedSample, q125LineClean,
    q126NtzRoundtrip, q127SemdedupPq, q128CcnetBuckets,
    q129BloomMembership, q130CmsFrequency, q131BpeTrain,
    q132QuantileSketch, q133NaiveBayes, q134Hits, q135TfidfCosine,
    q136Funnel, q137CohortRetention, q138OlsTrend, q139MarkovTransitions,
    q140MadOutliers, q141RollingZscore, q142RollupSubtotals,
    q143RfmSegments, q144FuzzyNames, q145CumulativeUniques,
    q146BasketPairs, q147RpAnn, q148Stickiness, q149Attribution,
    q150GapHistogram, q151ProfileAudit, q152Scd2Intervals, q153MomDeltas,
    q154AbTest, q155ChiSquare, q156DupSpans, q157JsDivergence,
    q158HllOverlap, q159ZorderLayout, q160BpeEncode, q161HybridRrf,
    q162SeasonalAnomaly, q163BloomSemijoin, q164Ewma,
    q165PersonalizedPr, q166ZipfFit, q167SkewHybrid,
    q168IncrementalRollup, q169TimeWeighted, q170Containment,
    q171Trending, q172TableDiff, q173TrailingUniques,
    q174PmiCollocations, q175QuantileDrift, q176RendezvousShard,
    q177BenfordAudit, q178SourceOverlap, q179PagerankBucketed,
    q180Zorder3, q181AnnRecall, q182PagerankTol, q183HitsTol, q184PprTol,
    q185KmeansTol, q186IvfPartitioned, q187MergeUpsert, q188LpaTol,
    q189Compaction, q190TriangleCount, q191Kcore, q192Sssp,
    q193IncrementalComponents, q194Closeness, q195PcaPower,
    q196PcaProject, q197LogregQuality, q198DedupCanonical,
    q199Betweenness, q200Sq8, q201CurationDedup, q202Anf,
    q203MixBudget, q204IvfIncremental, q205MixMaterialize, q206Fim,
    q207BatchAssembly, q208EditVerified, q209HeavyHitters,
    q210KcenterCoreset, q211DedupRewrite, q212Modularity, q213Mmr,
    q214RandomWalks, q215AhashDedup, q216NdcgEval, q217StlDecompose,
    q218AdamicAdar, q219SchemaEvolution, q220WeightedMedian,
    q221TrimmedMean, q222TheilSen, q223DataContract, q224SkipGrams,
    q225DedupPr, q226CorrMatrix, q227RagContext, q228AucEval,
    q229Calibration, q230Textrank, q231Snapshot,
    q232PagerankTolBucketed, q233WeightedQuantileSketch,
    q234ClosenessAccuracy, q235BetweennessAccuracy, q236HardNegatives,
    q237WeightedMedianKeyed)
}
