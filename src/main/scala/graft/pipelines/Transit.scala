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
      // arriving load (SFMuniDataHelper.py:504): what's on board as the
      // vehicle pulls in — the passenger-miles/VC load basis downstream
      .withColumn("LOAD_ARR", col("LOAD_DEP") - col("ON") + col("OFF"))
      // dwell minutes; the reference zeroes the AVL DWELL field at SEQ==1
      // and EOL (SFMuniDataHelper.py:509-511) — our synthetic AVL has no
      // DWELL field, so derive it from the dep-arr gap with the same zeroing
      .withColumn("DWELL",
        when(col("SEQ") === 1, 0.0).otherwise(
          (col("DEPARTURE_TIME").cast("double") - col("ARRIVAL_TIME").cast("double")) / 60.0))
    // F8 dedup — deterministic: bare dropDuplicates keeps a shuffle-order-
    // dependent row; keep the lexicographically-first record per key instead
    val dedupKey = Seq("DATE", "ROUTE_AVL", "DIR", "TRIP", "SEQ")
    val rest = typed.columns.filterNot(dedupKey.contains).toIndexedSeq
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
    * service midnight plus HEADWAY_S (scheduled headway, min) and FARE per
    * (DATE, ROUTE, DIR, TRIP, SEQ). */
  def expand(sched: DataFrame, cleaned: DataFrame): DataFrame = {
    val key = Seq("DATE", "ROUTE_SHORT_NAME", "DIR", "TRIP", "SEQ")
    val obs = cleaned.select(
      (key.map(col) :+ col("ARRIVAL_TIME") :+ col("DEPARTURE_TIME") :+
        col("ON") :+ col("OFF") :+ col("LOAD_DEP") :+ col("LOAD_ARR") :+
        col("DWELL") :+ col("CAPACITY")): _*)
    val joined = sched.join(obs, key, "left")
      .withColumn("OBSERVED", col("ARRIVAL_TIME").isNotNull.cast("int"))
    val runtimed = Windows.runtimeMinutes(joined,
      Seq("DATE", "ROUTE_SHORT_NAME", "DIR", "TRIP"), Seq("SEQ"),
      "ARRIVAL_TIME", "DEPARTURE_TIME", out = "RUNTIME")
    // E5: schedule deviation in fractional minutes (+ = late), signed and
    // rounded to 2dp exactly like getScheduleDeviation
    // (SFMuniDataExpander.py:82-97) — whole-minute flooring would lose
    // sub-minute deviations and can flip ONTIME5 at the -1/+5 boundaries.
    // Epoch-second arithmetic handles the post-midnight service-day
    // wraparound for free: ARRIVAL_TIME is anchored on DATE.
    def minSinceServiceMidnight(t: Column) =
      (t.cast("double") - col("DATE").cast("timestamp").cast("double")) / 60.0
    // On-time is the full TCRP rule via Exprs.onTime5: departed no more
    // than 1 min EARLY and arrived less than 5 min LATE
    // (SFMuniDataExpander.py:550-551) — arrival lateness alone would
    // overstate on-time performance for early-running service.
    runtimed
      .withColumn("ARRIVAL_DEV",
        when(col("OBSERVED") === 1,
          round(minSinceServiceMidnight(col("ARRIVAL_TIME")) - col("SCHED_ARR"), 2)))
      .withColumn("DEPARTURE_DEV",
        when(col("OBSERVED") === 1,
          round(minSinceServiceMidnight(col("DEPARTURE_TIME")) - col("SCHED_DEP"), 2)))
      .withColumn("ONTIME5",
        Exprs.onTime5(col("DEPARTURE_DEV"), col("ARRIVAL_DEV"), col("OBSERVED")))
      // passenger miles from the ARRIVING load (SFMuniDataExpander.py:554)
      .withColumn("PASSMILES", col("LOAD_ARR") * col("SERVMILES"))
      // passenger hours: riding (arriving load x runtime) + dwelling
      // (departing load x dwell) (SFMuniDataExpander.py:557-558)
      .withColumn("PASSHOURS",
        (col("LOAD_ARR") * col("RUNTIME") + col("LOAD_DEP") * col("DWELL")) / 60.0)
      // waiting: boardings wait half a scheduled headway on average (:561)
      .withColumn("WAITHOURS", col("ON") * lit(0.5) * col("HEADWAY_S") / 60.0)
      // revenue if every boarding paid full fare (:564)
      .withColumn("FULLFARE_REV", col("ON") * col("FARE"))
      // passenger-minutes of delay, late side only, masked to observed
      // (:567-574); null x 0 stays null like the reference's nan mask
      .withColumn("PASSDELAY_DEP",
        when(col("OBSERVED") === 1,
          when(col("DEPARTURE_DEV") > 0, col("ON") * col("DEPARTURE_DEV")).otherwise(0.0)))
      .withColumn("PASSDELAY_ARR",
        when(col("OBSERVED") === 1,
          when(col("ARRIVAL_DEV") > 0, col("ON") * col("ARRIVAL_DEV")).otherwise(0.0)))
      // volume/capacity on the crush capacity (:577); guard 0 — ANSI throws
      .withColumn("VC",
        when(col("CAPACITY") > 0, col("LOAD_ARR") / col("CAPACITY")))
      // crowded = VC over 85% of crush load ~ 125-150% of seated (:579-586);
      // np.where(nan > .85) is False in the reference, so null VC -> 0.0
      .withColumn("CROWDED",
        when(col("OBSERVED") === 1,
          coalesce((col("VC") > 0.85).cast("double"), lit(0.0))))
      .withColumn("CROWDHOURS",
        col("CROWDED") * (col("LOAD_ARR") * col("RUNTIME") + col("LOAD_DEP") * col("DWELL")) / 60.0)
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
    AggRule("PASSMILES", "PASSMILES", AggMethod.Sum),
    AggRule("PASSHOURS", "PASSHOURS", AggMethod.Sum),
    AggRule("WAITHOURS", "WAITHOURS", AggMethod.Sum),
    AggRule("FULLFARE_REV", "FULLFARE_REV", AggMethod.Sum),
    AggRule("PASSDELAY_DEP", "PASSDELAY_DEP", AggMethod.Sum),
    AggRule("PASSDELAY_ARR", "PASSDELAY_ARR", AggMethod.Sum),
    // crowding peaks, not totals (SFMuniDataAggregator.py:163-164)
    AggRule("VC", "VC", AggMethod.Max),
    AggRule("CROWDED", "CROWDED", AggMethod.Max),
    AggRule("CROWDHOURS", "CROWDHOURS", AggMethod.Sum))

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
    AggRule("PASSMILES", "PASSMILES", AggMethod.WgtSum),
    AggRule("PASSHOURS", "PASSHOURS", AggMethod.WgtSum),
    AggRule("WAITHOURS", "WAITHOURS", AggMethod.WgtSum),
    AggRule("FULLFARE_REV", "FULLFARE_REV", AggMethod.WgtSum),
    AggRule("PASSDELAY_DEP", "PASSDELAY_DEP", AggMethod.WgtSum),
    AggRule("PASSDELAY_ARR", "PASSDELAY_ARR", AggMethod.WgtSum),
    AggRule("VC", "VC", AggMethod.WgtAvg),
    AggRule("CROWDED", "CROWDED", AggMethod.WgtAvg),
    AggRule("CROWDHOURS", "CROWDHOURS", AggMethod.WgtSum))

  def routeDay(weightedTrips: DataFrame): DataFrame =
    RuleAgg.aggregate(weightedTrips.where(col("OBS_TRIP_STOPS") > 0),
      Seq("DATE", "ROUTE_SHORT_NAME", "DIR"), rollupRules,
      weight = Some("TRIP_WEIGHT"))

  def systemDay(routeDayDf: DataFrame): DataFrame =
    RuleAgg.aggregate(routeDayDf, Seq("DATE"), Seq(
      AggRule("TRIPS", "TRIPS", AggMethod.Sum),
      AggRule("ON", "ON", AggMethod.Sum),
      AggRule("ONTIME5", "ONTIME5", AggMethod.WgtAvg),
      AggRule("PASSMILES", "PASSMILES", AggMethod.Sum),
      AggRule("PASSHOURS", "PASSHOURS", AggMethod.Sum),
      AggRule("WAITHOURS", "WAITHOURS", AggMethod.Sum),
      AggRule("FULLFARE_REV", "FULLFARE_REV", AggMethod.Sum),
      AggRule("PASSDELAY_DEP", "PASSDELAY_DEP", AggMethod.Sum),
      AggRule("PASSDELAY_ARR", "PASSDELAY_ARR", AggMethod.Sum),
      AggRule("VC", "VC", AggMethod.WgtAvg),
      AggRule("CROWDED", "CROWDED", AggMethod.WgtAvg),
      AggRule("CROWDHOURS", "CROWDHOURS", AggMethod.Sum)),
      weight = Some("TRIPS"))

  /** A7 — master-route aggregation (SFMuniDataAggregator.py:807-929):
    * routes that change names mid-month (the 5L -> 5R April-2015 case)
    * would double-count at the monthly route grain; the equivalency table
    * maps both names to one master route, observation counts SUM, rates
    * and means weight by NUMDAYS (the rule-table engine's WgtAvg —
    * numerator skips null months, denominator is the total weight).
    * Routes the equivalency doesn't map are dropped, exactly as a pandas
    * groupby drops NaN keys in the reference.
    */
  def masterRoute(
      routeMonthly: DataFrame, routeEquiv: DataFrame,
      groupCols: Seq[String] = Seq("MONTH"),
      rules: Seq[AggRule] = masterRouteRules): DataFrame =
    RuleAgg.aggregate(
      routeMonthly
        .join(org.apache.spark.sql.functions.broadcast(routeEquiv),
          Seq("ROUTE_SHORT_NAME"), "left")
        .where(col("MASTER_ROUTE_NAME").isNotNull),
      groupCols :+ "MASTER_ROUTE_NAME", rules, weight = Some("NUMDAYS"))

  val masterRouteRules: Seq[AggRule] = Seq(
    AggRule("NUMDAYS", "NUMDAYS", AggMethod.Sum),
    AggRule("TRIPS", "TRIPS", AggMethod.Sum),
    AggRule("ON", "ON", AggMethod.WgtAvg),
    AggRule("ONTIME5", "ONTIME5", AggMethod.WgtAvg))

  /** The reporter's full system-performance battery
    * (TransitReporter.py:123-160, assembleSystemPerformanceData): a
    * monthly trips table carrying the reference vocabulary (TRIPS,
    * TRIP_STOPS, OBS_TRIPS, IMP_TRIPS, ON, OFF, SERVMILES, SERVMILES_S,
    * PASSMILES, PASSHOURS, WAITHOURS, FULLFARE_REV, PASSDELAY_DEP/_ARR,
    * DWELL) -> the ~20 derived measures, including the coverage rates
    * (OBSERVED_PCT / IMPUTED_PCT), the MEASURE_ERR / WEIGHT_ERR audit
    * columns and their estimation fields (TransitReporter.py:152-160),
    * then the demand drivers (employment TOTEMP, population POP, auto
    * operating cost FUEL_PRICE*) attached by MONTH-keyed broadcast left
    * joins (TransitReporter.py:163-172).
    *
    * Determinism contract (needed for cross-engine hash equality): every
    * division is floor-scaled at 6dp — floor of bit-identical doubles is
    * identical where round-half behavior differs between engines — and
    * guarded against 0 (ANSI x/0 throws); products and differences of
    * already-exact inputs are left raw. PASSPEED deliberately derives
    * from the already-floored MILES_PER_PASS / IVT_PER_PAS, exactly as
    * the reference derives it from the df columns it just assigned.
    */
  def systemPerformance(
      trips: DataFrame, employment: DataFrame, population: DataFrame,
      autoOpCost: DataFrame, monthCol: String = "MONTH"): DataFrame = {
    def ratio(n: Column, den: Column): Column = when(den =!= 0, n / den)
    def floor6(c: Column): Column = floor(c * 1e6) / 1e6
    trips
      .withColumn("DWELL_PER_STOP", floor6(ratio(col("DWELL"), col("TRIP_STOPS"))))
      .withColumn("FARE_PER_PASS", floor6(ratio(col("FULLFARE_REV"), col("ON"))))
      .withColumn("MILES_PER_PASS", floor6(ratio(col("PASSMILES"), col("ON"))))
      .withColumn("IVT_PER_PAS", floor6(ratio(col("PASSHOURS"), col("ON")) * lit(60.0)))
      .withColumn("PASSPEED",
        floor6(ratio(col("MILES_PER_PASS"), col("IVT_PER_PAS")) * lit(60.0)))
      .withColumn("WAIT_PER_PAS", floor6(ratio(col("WAITHOURS"), col("ON")) * lit(60.0)))
      .withColumn("DELAY_DEP_PER_PASS", floor6(ratio(col("PASSDELAY_DEP"), col("ON"))))
      .withColumn("DELAY_ARR_PER_PASS", floor6(ratio(col("PASSDELAY_ARR"), col("ON"))))
      .withColumn("OBSERVED_PCT", floor6(ratio(col("OBS_TRIPS"), col("TRIPS"))))
      .withColumn("IMPUTED_PCT", floor6(ratio(col("IMP_TRIPS"), col("TRIPS"))))
      .withColumn("MEASURE_ERR", floor6(ratio(col("OFF"), col("ON")) - lit(1.0)))
      .withColumn("WEIGHT_ERR", floor6(ratio(col("SERVMILES"), col("SERVMILES_S")) - lit(1.0)))
      .withColumn("OFF_MINUS_ON", col("OFF") - col("ON"))
      .withColumn("SERVMILES_MINUS_SERVMILES_S", col("SERVMILES") - col("SERVMILES_S"))
      .withColumn("MEASURE_ERR_ON", col("MEASURE_ERR") * col("ON"))
      .withColumn("WEIGHT_ERR_ON", col("WEIGHT_ERR") * col("ON"))
      .join(org.apache.spark.sql.functions.broadcast(employment), Seq(monthCol), "left")
      .join(org.apache.spark.sql.functions.broadcast(population), Seq(monthCol), "left")
      .join(org.apache.spark.sql.functions.broadcast(autoOpCost), Seq(monthCol), "left")
  }

  /** The Dec-2009 8X/9X patch at the master-route level
    * (SFMuniDataAggregator.py:905-929): a target month whose aggregated
    * measures came out null (the underlying route's data is missing) is
    * filled from a donor month of the SAME master route — only null
    * columns are touched. Relational form: broadcast the donor month's
    * rows, coalesce per column on the target month.
    */
  def fillMonthFromDonor(
      df: DataFrame, keys: Seq[String], monthCol: String,
      targetMonth: String, donorMonth: String,
      valueCols: Seq[String]): DataFrame = {
    val donor = df
      .where(col(monthCol) === lit(donorMonth).cast("timestamp"))
      .select((keys.map(col) ++ valueCols.map(c => col(c).as(s"__donor_$c"))): _*)
    val patched = df.join(
      org.apache.spark.sql.functions.broadcast(donor), keys, "left")
    val filled = valueCols.foldLeft(patched) { (acc, c) =>
      acc.withColumn(c,
        when(col(monthCol) === lit(targetMonth).cast("timestamp"),
          coalesce(col(c), col(s"__donor_$c"))).otherwise(col(c)))
    }
    filled.drop(valueCols.map(c => s"__donor_$c"): _*)
  }
}
