package graft.pipelines

import graft.agg.{AggMethod, AggRule, RuleAgg}
import graft.functions.Exprs
import graft.operators.{Joins, Windows}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's flagship flow re-expressed Spark-first (SURVEY.md §3):
  *
  *   clean   (SFMuniDataHelper.py:422-618): fixed-width AVL/APC events →
  *           filters, type coercion, service-day times, dedup, route-equiv
  *           interval join. One job — the reference's per-date driver loop
  *           disappears into partitioned execution.
  *   expand  (SFMuniDataExpander.py:322-619): schedule ⟕ observed (J1),
  *           observed runtime (W2), performance measures (E5) masked to
  *           observed rows, trip aggregation (A1) and expansion weighting
  *           (W8).
  *   aggregate (SFMuniDataAggregator.py): the weighted rule-table cascade
  *           to route/day and system/day levels.
  *
  * Columns follow the reference's vocabulary (DATE, ROUTE, DIR, TRIP, SEQ,
  * ON, OFF, LOAD_DEP, ARRIVAL/DEPARTURE times, OBSERVED...).
  */
object Transit {

  /** clean: raw AVL (already parsed from fixed-width by the caller) +
    * route-equiv dimension with validity windows. */
  def clean(avl: DataFrame, routeEquiv: DataFrame): DataFrame = {
    val typed = avl
      .na.drop(Seq("SEQ"))                              // F1: mid-file headers
      .where(col("RDBRDNGS") < 1000)                    // F2: misaligned rows
      .where(col("DIR") < 2 && col("QC201") <= 20 &&
        col("ROUTE_AVL") > 0 && col("TRIP") < 9999)     // F3: revenue service + QC
      .withColumn("DATE", Exprs.mdyIntToDate(col("DATE_INT")))       // E2
      .withColumn("ARRIVAL_TIME",
        Exprs.serviceTime(col("DATE"), col("ARRIVAL_TIME_INT")))     // E1
      .withColumn("DEPARTURE_TIME",
        Exprs.serviceTime(col("DATE"), col("DEPARTURE_TIME_INT")))
    // F8 dedup — deterministic: bare dropDuplicates keeps a shuffle-order-
    // dependent row; keep the lexicographically-first record per key instead
    val dedupKey = Seq("DATE", "ROUTE_AVL", "DIR", "TRIP", "SEQ")
    val rest = typed.columns.filterNot(dedupKey.contains)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(dedupKey.map(col): _*)
      .orderBy(rest.map(col): _*)
    val deduped = typed
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    Joins.intervalJoin(deduped, routeEquiv, Seq("ROUTE_AVL"),
        factTime = col("DATE").cast("timestamp"),
        dimStart = col("START_DATE"), dimEnd = col("END_DATE"),
        joinType = "left")                              // J4
      .drop(routeEquiv("ROUTE_AVL"))
  }

  /** expand: schedule trip-stops ⟕ cleaned AVL on the expansion key, then
    * derived measures. `sched` carries SCHED_ARR/SCHED_DEP minutes since
    * service midnight per (DATE, ROUTE, DIR, TRIP, SEQ). */
  def expand(sched: DataFrame, cleaned: DataFrame): DataFrame = {
    val key = Seq("DATE", "ROUTE_SHORT_NAME", "DIR", "TRIP", "SEQ")
    val obs = cleaned.select(
      (key.map(col) :+ col("ARRIVAL_TIME") :+ col("DEPARTURE_TIME") :+
        col("ON") :+ col("OFF") :+ col("LOAD_DEP")): _*)
    val joined = sched.join(obs, key, "left")
      .withColumn("OBSERVED", col("ARRIVAL_TIME").isNotNull.cast("int"))
    val runtimed = Windows.runtimeMinutes(joined,
      Seq("DATE", "ROUTE_SHORT_NAME", "DIR", "TRIP"), Seq("SEQ"),
      "ARRIVAL_TIME", "DEPARTURE_TIME", out = "RUNTIME")
    // E5: schedule deviation in minutes (+ = late), on-time, pass-miles.
    // On-time is the full TCRP rule via Exprs.onTime5: departed no more
    // than 1 min EARLY and arrived less than 5 min LATE
    // (SFMuniDataExpander.py:550-551) — arrival lateness alone would
    // overstate on-time performance for early-running service.
    def minOfDay(t: Column) =
      hour(t) * 60 + minute(t) +
        when(to_date(t) > col("DATE"), 24 * 60).otherwise(0)
    runtimed
      .withColumn("ARRIVAL_DEV",
        when(col("OBSERVED") === 1, minOfDay(col("ARRIVAL_TIME")) - col("SCHED_ARR")))
      .withColumn("DEPARTURE_DEV",
        when(col("OBSERVED") === 1, minOfDay(col("DEPARTURE_TIME")) - col("SCHED_DEP")))
      .withColumn("ONTIME5",
        Exprs.onTime5(col("DEPARTURE_DEV"), col("ARRIVAL_DEV"), col("OBSERVED")))
      .withColumn("PASSMILES",
        when(col("OBSERVED") === 1, col("LOAD_DEP") * col("SERVMILES")))
  }

  /** A1 rules: trip-stops -> trips, exercising the full method vocabulary
    * the reference's 45-rule table uses (SFMuniDataAggregator.py:110-184):
    * count/sum/mean plus order-deterministic first/last, min/max, and
    * countDistinct. */
  val tripRules = Seq(
    AggRule("TRIP_STOPS", "SEQ", AggMethod.Count),
    AggRule("N_SEQS", "SEQ", AggMethod.CountDistinct),
    AggRule("OBS_TRIP_STOPS", "OBSERVED", AggMethod.Sum),
    AggRule("ON", "ON", AggMethod.Sum),
    AggRule("OFF", "OFF", AggMethod.Sum),
    AggRule("MAX_LOAD", "LOAD_DEP", AggMethod.Max),
    AggRule("FIRST_ARR", "ARRIVAL_TIME", AggMethod.First),
    AggRule("LAST_ARR", "ARRIVAL_TIME", AggMethod.Last),
    AggRule("RUNTIME", "RUNTIME", AggMethod.Sum),
    AggRule("ONTIME5", "ONTIME5", AggMethod.Mean),
    AggRule("PASSMILES", "PASSMILES", AggMethod.Sum))

  def aggregateToTrips(ts: DataFrame): DataFrame =
    RuleAgg.aggregate(ts,
      Seq("DATE", "ROUTE_SHORT_NAME", "DIR", "TRIP"), tripRules,
      order = Some("SEQ"))

  /** W8: weight observed trips so they represent all scheduled trips per
    * (DATE, ROUTE, DIR). */
  def weightTrips(trips: DataFrame): DataFrame = {
    val g = Seq("DATE", "ROUTE_SHORT_NAME", "DIR")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(g.map(col): _*)
    trips
      .withColumn("SCHED_TRIPS", count(lit(1)).over(w))
      .withColumn("OBS_TRIPS",
        sum((col("OBS_TRIP_STOPS") > 0).cast("int")).over(w))
      .withColumn("TRIP_WEIGHT",
        when(col("OBS_TRIP_STOPS") > 0,
          col("SCHED_TRIPS").cast("double") / col("OBS_TRIPS")))
  }

  /** A5/A6-style weighted rollup of observed trips to route/date, then
    * system/date. maxLevel keeps the route name only below system level. */
  val rollupRules = Seq(
    AggRule("TRIPS", "TRIP_WEIGHT", AggMethod.Sum),
    AggRule("ON", "ON", AggMethod.WgtSum),
    AggRule("OFF", "OFF", AggMethod.WgtSum),
    AggRule("RUNTIME", "RUNTIME", AggMethod.WgtSum),
    AggRule("ONTIME5", "ONTIME5", AggMethod.WgtAvg),
    AggRule("PASSMILES", "PASSMILES", AggMethod.WgtSum))

  def routeDay(weightedTrips: DataFrame): DataFrame =
    RuleAgg.aggregate(weightedTrips.where(col("OBS_TRIP_STOPS") > 0),
      Seq("DATE", "ROUTE_SHORT_NAME", "DIR"), rollupRules,
      weight = Some("TRIP_WEIGHT"))

  def systemDay(routeDayDf: DataFrame): DataFrame =
    RuleAgg.aggregate(routeDayDf, Seq("DATE"), Seq(
      AggRule("TRIPS", "TRIPS", AggMethod.Sum),
      AggRule("ON", "ON", AggMethod.Sum),
      AggRule("ONTIME5", "ONTIME5", AggMethod.WgtAvg),
      AggRule("PASSMILES", "PASSMILES", AggMethod.Sum)),
      weight = Some("TRIPS"))
}
