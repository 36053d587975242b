package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

/** S5 — GTFS feed source (SURVEY.md §2.1). The reference iterates a
  * transitfeed object model (GTFSHelper.py:155-160,324-542); here the zip
  * members are extracted and read as schema'd CSVs, and the object-model
  * walks become relational joins:
  *
  *   trip-stop schedule = stop_times ⋈ trips ⋈ routes
  *
  * GTFS times may exceed 24:00:00 (service-day wraparound, E1) so they are
  * parsed to seconds-since-service-midnight, not timestamps.
  */
object Gtfs {

  val members = Seq("routes.txt", "trips.txt", "stop_times.txt",
    "calendar.txt", "shapes.txt", "stops.txt",
    "fare_attributes.txt", "fare_rules.txt")

  /** Extract known members of a GTFS zip into destDir (driver-side: feed
    * zips are small config artifacts; the big data is what they join to).
    */
  def extractZip(zipPath: String, destDir: String): Unit = {
    val dest = new File(destDir)
    dest.mkdirs()
    val zf = new ZipFile(zipPath)
    try {
      val it = zf.entries()
      while (it.hasMoreElements) {
        val e = it.nextElement()
        if (members.contains(e.getName)) {
          val out = new FileOutputStream(new File(dest, e.getName))
          try zf.getInputStream(e).transferTo(out)
          finally out.close()
        }
      }
    } finally zf.close()
  }

  /** Read an extracted feed directory into per-member DataFrames. */
  def readFeed(spark: SparkSession, dir: String): Map[String, DataFrame] =
    members.filter(m => new File(dir, m).exists()).map { m =>
      m.stripSuffix(".txt") ->
        spark.read.option("header", "true").csv(s"$dir/$m")
    }.toMap

  /** "HH:MM:SS" (possibly >= 24h) -> seconds since service midnight. */
  def gtfsTimeToSeconds(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p = split(c, ":")
    p.getItem(0).cast("int") * 3600 + p.getItem(1).cast("int") * 60 +
      p.getItem(2).cast("int")
  }

  /** Trip-stop schedule with headways (W1): stop_times ⋈ trips ⋈ routes,
    * departure seconds, minutes since the previous trip serving the same
    * (route, direction, stop). */
  def tripStopSchedule(feed: Map[String, DataFrame]): DataFrame = {
    val st = feed("stop_times")
      .withColumn("dep_s", gtfsTimeToSeconds(col("departure_time")))
      .withColumn("seq", col("stop_sequence").cast("int"))
    val trips = feed("trips").select("trip_id", "route_id", "direction_id", "service_id")
    val routes = feed("routes").select("route_id", "route_short_name")
    val joined = st.join(trips, "trip_id").join(routes, "route_id")
    val w = Window.partitionBy(col("route_id"), col("direction_id"), col("stop_id"))
      .orderBy(col("dep_s"), col("trip_id"))
    joined.withColumn("headway_min",
      (col("dep_s") - lag(col("dep_s"), 1).over(w)) / 60.0)
  }

  /** Calendar service periods expanded to concrete service dates via
    * explode(sequence(start, end)) filtered on the weekday flags
    * (GTFSHelper.py:192-237's GetServicePeriodsActiveEachDate loop as one
    * relational pass). DOW follows the reference's recode: the SERVICE_ID
    * string drives it — SAT/2 -> 2, SUN/3 -> 3, anything else weekday 1
    * (GTFSHelper.py:229-236). Returns (service_id, date, dow).
    */
  def serviceDates(feed: Map[String, DataFrame]): DataFrame = {
    val cal = feed("calendar")
      .withColumn("start", to_date(col("start_date"), "yyyyMMdd"))
      .withColumn("end", to_date(col("end_date"), "yyyyMMdd"))
    val flags = Seq("monday", "tuesday", "wednesday", "thursday", "friday",
      "saturday", "sunday")
    // ISO day-of-week via engine-portable arithmetic: 1970-01-01 was a
    // Thursday -> (epoch_days + 3) % 7 gives Monday=0..Sunday=6
    val isoDow = pmod(unix_date(col("date")) + 3, lit(7))
    val active = flags.zipWithIndex.map { case (f, i) =>
      isoDow === i && col(f) === "1"
    }.reduce(_ || _)
    cal.withColumn("date", explode(sequence(col("start"), col("end"))))
      .where(active)
      .withColumn("dow",
        when(upper(col("service_id")).isin("SAT", "2"), 2)
          .when(upper(col("service_id")).isin("SUN", "3"), 3)
          .otherwise(1))
      .select("service_id", "date", "dow")
  }

  /** W7 — the full trip-stop schedule (GTFSHelper.py:375-527): dwell,
    * runtime, total time, cumulative shape distance -> per-link
    * SERVMILES_S, speeds, and the fare join.
    *
    * Distance chain: shape_dist_traveled (meters, converted at the
    * reference's 3.2808399 ft/m) when present and positive; otherwise the
    * cumulative planar stop-to-stop distance from stops.txt coordinates
    * (the use_shape_dist=False branch, GTFSHelper.py:474-487). Service
    * miles are the per-link distance delta in miles, 0 at start of line,
    * rounded to 3 (:489-493). Negative deltas are flagged in
    * `neg_miles` rather than silently kept — the reference raises
    * (:516-519); callers gate on assertNonNegativeMiles.
    */
  def tripStopScheduleFull(feed: Map[String, DataFrame]): DataFrame = {
    val base0 = tripStopSchedule(feed)
      .withColumn("arr_s", gtfsTimeToSeconds(col("arrival_time")))
    val base =
      if (base0.columns.contains("shape_dist_traveled")) base0
      else base0.withColumn("shape_dist_traveled", lit(null).cast("double"))
    val wTrip = Window.partitionBy(col("trip_id")).orderBy(col("seq"))
    // stop coordinates: planar stop_x/stop_y when provided, else lon/lat
    // projected with the LCC geodesy the reference uses
    // (convertLongitudeLatitudeToXY); absent stops.txt -> null coords and
    // the distance chain contributes 0
    val withStops = feed.get("stops") match {
      case Some(stops) if stops.columns.contains("stop_x") =>
        val s = stops.select(col("stop_id"),
          col("stop_x").cast("double").as("__sx"),
          col("stop_y").cast("double").as("__sy"))
        base.join(broadcast(s), Seq("stop_id"), "left")
      case Some(stops) =>
        val (x, y) = graft.functions.Exprs.lccXY(
          col("stop_lon").cast("double"), col("stop_lat").cast("double"))
        val s = stops.select(col("stop_id"), x.as("__sx"), y.as("__sy"))
        base.join(broadcast(s), Seq("stop_id"), "left")
      case None =>
        base.withColumn("__sx", lit(null).cast("double"))
          .withColumn("__sy", lit(null).cast("double"))
    }
    val sdtFeet = col("shape_dist_traveled").cast("double") * 3.2808399
    val stopDist = sqrt(pow(col("__sx") - lag(col("__sx"), 1).over(wTrip), 2) +
      pow(col("__sy") - lag(col("__sy"), 1).over(wTrip), 2))
    val measured = withStops
      .withColumn("sol", (row_number().over(wTrip) === 1).cast("int"))
      .withColumn("dist_feet",
        when(col("shape_dist_traveled").isNotNull &&
             col("shape_dist_traveled").cast("double") > 0, sdtFeet)
          .otherwise(sum(coalesce(stopDist, lit(0.0))).over(
            wTrip.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("DWELL_S", (col("dep_s") - col("arr_s")) / 60.0)
      .withColumn("RUNTIME_S",
        when(col("sol") === 1, 0.0)
          .otherwise((col("arr_s") - lag(col("dep_s"), 1).over(wTrip)) / 60.0))
      .withColumn("TOTTIME_S", col("RUNTIME_S") + col("DWELL_S"))
      .withColumn("SERVMILES_S",
        when(col("sol") === 1, 0.0)
          .otherwise(round(
            (col("dist_feet") - lag(col("dist_feet"), 1).over(wTrip)) / 5280.0, 3)))
      .withColumn("neg_miles", col("SERVMILES_S") < 0)
      .withColumn("RUNSPEED_S",
        when(col("RUNTIME_S") > 0,
          round(col("SERVMILES_S") / (col("RUNTIME_S") / 60.0), 2))
          .otherwise(0.0))
      .withColumn("TOTSPEED_S",
        when(col("TOTTIME_S") > 0,
          round(col("SERVMILES_S") / (col("TOTTIME_S") / 60.0), 2))
          .otherwise(0.0))
    // fare: fare_rules keys route_id -> fare_id -> fare_attributes.price
    (feed.get("fare_attributes"), feed.get("fare_rules")) match {
      case (Some(attrs), Some(rules)) =>
        val fares = rules.select("fare_id", "route_id")
          .join(attrs.select(col("fare_id"),
            col("price").cast("double").as("FARE")), "fare_id")
          .select("route_id", "FARE")
        measured.join(broadcast(fares), Seq("route_id"), "left")
      case _ => measured.withColumn("FARE", lit(null).cast("double"))
    }
  }

  /** The reference's negative-service-miles gate (GTFSHelper.py:516-519
    * raises ValueError). Call after tripStopScheduleFull. */
  def assertNonNegativeMiles(schedule: DataFrame): DataFrame = {
    val bad = schedule.where(col("neg_miles")).count()
    require(bad == 0, s"$bad trip-stops have negative service miles")
    schedule
  }

  /** A8 — daily system totals (GTFSHelper.py:260-282): the schedule joined
    * to its active service dates, then per-date system rows with
    * countUnique trips/stops, trip-stop counts, service-mile sums, and
    * fare/headway means. One shuffle: countDistinct forces an expand, but
    * the group key (date) keeps partial aggregation effective.
    */
  def dailySystemTotals(schedule: DataFrame, dates: DataFrame): DataFrame = {
    // one dow per DATE, not per service period: a date served by periods
    // of different classes (holiday SUN service alongside weekday) must
    // emit ONE system row. The reference's override loop resolves the
    // highest recode across active periods (GTFSHelper.py:229-246) —
    // max() over the active periods reproduces it.
    val dowPerDate = dates.groupBy("date").agg(max(col("dow")).as("dow"))
    schedule.join(dates.select("service_id", "date"), "service_id")
      .groupBy("date")
      .agg(countDistinct(col("trip_id")).as("TRIPS"),
        countDistinct(col("stop_id")).as("STOPS"),
        count(lit(1)).as("TRIP_STOPS"),
        avg(col("FARE")).as("FARE"),
        avg(col("headway_min")).as("HEADWAY_S"),
        sum(col("SERVMILES_S")).as("SERVMILES_S"),
        sum(col("DWELL_S")).as("DWELL_S"),
        sum(col("RUNTIME_S")).as("RUNTIME_S"),
        sum(col("TOTTIME_S")).as("TOTTIME_S"),
        avg(col("RUNSPEED_S")).as("RUNSPEED_S"),
        avg(col("TOTSPEED_S")).as("TOTSPEED_S"))
      .join(broadcast(dowPerDate), "date")
      .select(Seq("date", "dow", "TRIPS", "STOPS", "TRIP_STOPS", "FARE",
        "HEADWAY_S", "SERVMILES_S", "DWELL_S", "RUNTIME_S", "TOTTIME_S",
        "RUNSPEED_S", "TOTSPEED_S").map(col): _*)
  }

  /** A9 — monthly system totals: means of the daily rows per (month, dow)
    * (GTFSHelper.py:287-321). */
  def monthlySystemTotals(daily: DataFrame): DataFrame =
    daily
      .withColumn("month", date_trunc("MONTH", col("date").cast("timestamp")))
      .groupBy("month", "dow")
      .agg(avg("TRIPS").as("TRIPS"), avg("STOPS").as("STOPS"),
        avg("TRIP_STOPS").as("TRIP_STOPS"), avg("FARE").as("FARE"),
        avg("HEADWAY_S").as("HEADWAY_S"), avg("SERVMILES_S").as("SERVMILES_S"),
        avg("DWELL_S").as("DWELL_S"), avg("RUNTIME_S").as("RUNTIME_S"),
        avg("TOTTIME_S").as("TOTTIME_S"), avg("RUNSPEED_S").as("RUNSPEED_S"),
        avg("TOTSPEED_S").as("TOTSPEED_S"))

  /** Build a zip from (memberName -> csv text) — fixture helper. */
  def writeZip(zipPath: String, files: Seq[(String, String)]): Unit = {
    new File(zipPath).getParentFile.mkdirs()
    val out = new ZipOutputStream(new FileOutputStream(zipPath))
    try files.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
  }
}
