package graft

import graft.sources.Gtfs
import org.apache.spark.sql.functions._

/** S5/W7/A8 unit coverage beyond the q48/q71/q72 oracles: calendar
  * expansion + DOW recode, the stop-coordinate fallback distance chain,
  * and the negative-service-miles gate (GTFSHelper.py:516-519 raises). */
class GtfsSpec extends SparkSpec {
  import spark.implicits._

  private def writeFeed(dir: String, files: Seq[(String, String)]) = {
    Gtfs.writeZip(s"$dir/feed.zip", files)
    Gtfs.extractZip(s"$dir/feed.zip", s"$dir/feed")
    Gtfs.readFeed(spark, s"$dir/feed")
  }

  private val routes = "route_id,route_short_name,route_type\nR1,10,3\n"
  private val trips = "trip_id,route_id,service_id,direction_id\nt1,R1,SAT,0\n"

  test("serviceDates: flag-filtered date expansion with the SAT/SUN recode") {
    val cal = "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\n" +
      "WKDY,1,1,1,1,1,0,0,20240101,20240107\nSAT,0,0,0,0,0,1,0,20240101,20240107\n"
    val st = "trip_id,stop_id,stop_sequence,arrival_time,departure_time\nt1,S1,1,08:00:00,08:00:00\n"
    val feed = writeFeed("/root/repo/tmp/gtfs_t1",
      Seq("routes.txt" -> routes, "trips.txt" -> trips,
        "stop_times.txt" -> st, "calendar.txt" -> cal))
    val d = Gtfs.serviceDates(feed)
      .select(col("service_id"), col("date").cast("string"), col("dow"))
      .as[(String, String, Int)].collect().toSeq.sorted
    // Jan 1 2024 is a Monday: WKDY covers Mon Jan 1 - Fri Jan 5, dow 1;
    // SAT covers Sat Jan 6 only, dow 2
    assert(d == Seq(
      ("SAT", "2024-01-06", 2),
      ("WKDY", "2024-01-01", 1), ("WKDY", "2024-01-02", 1),
      ("WKDY", "2024-01-03", 1), ("WKDY", "2024-01-04", 1),
      ("WKDY", "2024-01-05", 1)))
  }

  test("coordinate fallback: cumulative stop-to-stop planar distance") {
    // no shape_dist_traveled; stops 1 mile apart on the x axis
    val st = "trip_id,stop_id,stop_sequence,arrival_time,departure_time\n" +
      "t1,S1,1,08:00:00,08:00:00\nt1,S2,2,08:04:00,08:04:00\nt1,S3,3,08:08:00,08:08:00\n"
    val stops = "stop_id,stop_x,stop_y\nS1,0,0\nS2,5280,0\nS3,5280,3960\n"
    val cal = "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\nSAT,0,0,0,0,0,1,0,20240101,20240107\n"
    val feed = writeFeed("/root/repo/tmp/gtfs_t2",
      Seq("routes.txt" -> routes, "trips.txt" -> trips,
        "stop_times.txt" -> st, "calendar.txt" -> cal, "stops.txt" -> stops))
    val sched = Gtfs.assertNonNegativeMiles(Gtfs.tripStopScheduleFull(feed))
    val m = sched.orderBy("seq").select("SERVMILES_S").as[Double].collect().toSeq
    assert(m == Seq(0.0, 1.0, 0.75))
  }

  test("negative service miles are gated, not silently kept") {
    // shape distance DECREASES between stops 2 and 3 -> a negative delta
    val st = "trip_id,stop_id,stop_sequence,arrival_time,departure_time,shape_dist_traveled\n" +
      "t1,S1,1,08:00:00,08:00:00,0\nt1,S2,2,08:04:00,08:04:00,2000\nt1,S3,3,08:08:00,08:08:00,1000\n"
    val cal = "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\nSAT,0,0,0,0,0,1,0,20240101,20240107\n"
    val feed = writeFeed("/root/repo/tmp/gtfs_t3",
      Seq("routes.txt" -> routes, "trips.txt" -> trips,
        "stop_times.txt" -> st, "calendar.txt" -> cal))
    val ex = intercept[IllegalArgumentException] {
      Gtfs.assertNonNegativeMiles(Gtfs.tripStopScheduleFull(feed))
    }
    assert(ex.getMessage.contains("negative service miles"))
  }

  test("dailySystemTotals: one system row per date across mixed service classes") {
    // Sat Jan 6 2024 is served by BOTH the holiday SUN service and a
    // special weekday-class service: the reference resolves ONE dow per
    // date (the highest recode wins, GTFSHelper.py:229-246) and emits a
    // single system row spanning all active periods' trips.
    val cal = "service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\n" +
      "SUN,0,0,0,0,0,1,0,20240106,20240106\nWKDY,0,0,0,0,0,1,0,20240106,20240106\n"
    val trips2 = "trip_id,route_id,service_id,direction_id\n" +
      "t1,R1,SUN,0\nt2,R1,WKDY,0\n"
    val st = "trip_id,stop_id,stop_sequence,arrival_time,departure_time\n" +
      "t1,S1,1,08:00:00,08:00:00\nt1,S2,2,08:04:00,08:05:00\n" +
      "t2,S1,1,09:00:00,09:00:00\nt2,S2,2,09:04:00,09:05:00\n"
    val feed = writeFeed("/root/repo/tmp/gtfs_t4",
      Seq("routes.txt" -> routes, "trips.txt" -> trips2,
        "stop_times.txt" -> st, "calendar.txt" -> cal))
    val daily = Gtfs.dailySystemTotals(
      Gtfs.tripStopScheduleFull(feed), Gtfs.serviceDates(feed))
      .select(col("date").cast("string"), col("dow"), col("TRIPS"),
        col("TRIP_STOPS"))
      .as[(String, Int, Long, Long)].collect().toSeq
    // one row, dow = max(SUN=3, weekday=1) = 3, trips/trip-stops span both
    assert(daily == Seq(("2024-01-06", 3, 2L, 4L)))
  }
}
