package graft.pipelines

import graft.sources.FixedWidth
import graft.sources.FixedWidth.ColSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic AVL/GTFS/route-equiv fixture for the transit pipeline
  * (FIXTURES.md F1/F2 shapes): 2 routes, a mid-period route rename, an
  * unobserved trip, a post-midnight (>= 240000) arrival, a QC-failing row,
  * a non-revenue DIR row, a duplicate, and a mid-file header line. Golden
  * outputs are hand-computed in TransitPipelineSpec and inlined as the
  * q49 oracle.
  */
object TransitFixture {

  val avlSpecs = Seq(
    ColSpec("SEQ", 1, 4, LongType),
    ColSpec("RDBRDNGS", 5, 6, LongType),
    ColSpec("DIR", 11, 2, LongType),
    ColSpec("QC201", 13, 4, LongType),
    ColSpec("ROUTE_AVL", 17, 4, LongType),
    ColSpec("TRIP", 21, 6, LongType),
    ColSpec("DATE_INT", 27, 8, LongType),
    ColSpec("ARRIVAL_TIME_INT", 35, 8, LongType),
    ColSpec("DEPARTURE_TIME_INT", 43, 8, LongType),
    ColSpec("ON", 51, 4, LongType),
    ColSpec("OFF", 55, 4, LongType),
    ColSpec("LOAD_DEP", 59, 4, LongType),
    ColSpec("CAPACITY", 63, 4, LongType))

  /** (SEQ, RDBRDNGS, DIR, QC201, ROUTE_AVL, TRIP, DATE_INT, ARR, DEP, ON, OFF, LOAD, CAP).
    * Stop 1 arrives at 08:02:30 — the 30s exercises fractional-minute
    * schedule deviation. Trip 1's CAPACITY of 6 makes its last stop
    * (LOAD_ARR=6) cross the VC>0.85 crowding threshold. */
  val avlRows: Seq[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)] = Seq(
    // 2024-01-15, route 1 ("10"), trip 1: 3 observed stops
    (1L, 10L, 0L, 0L, 1L, 1L, 11524L, 80230L, 80300L, 5L, 0L, 5L, 6L),
    (2L, 10L, 0L, 0L, 1L, 1L, 11524L, 80700L, 80800L, 2L, 1L, 6L, 6L),
    (3L, 10L, 0L, 0L, 1L, 1L, 11524L, 81600L, 81700L, 0L, 6L, 0L, 6L),
    // duplicate of stop 1 (dedup target)
    (1L, 10L, 0L, 0L, 1L, 1L, 11524L, 80230L, 80300L, 5L, 0L, 5L, 6L),
    // QC-failing row (dropped by F3)
    (2L, 10L, 0L, 99L, 1L, 1L, 11524L, 80790L, 80890L, 9L, 9L, 9L, 6L),
    // non-revenue pull-out DIR=6 (dropped by F3)
    (1L, 10L, 6L, 0L, 1L, 5L, 11524L, 70000L, 70100L, 0L, 0L, 0L, 6L),
    // route 2 ("N"), trip 7: post-midnight arrival 24:05 (service day 01-15)
    (1L, 10L, 0L, 0L, 2L, 7L, 11524L, 240500L, 240600L, 3L, 0L, 3L, 50L),
    // 2024-02-15: route 1 renamed to "10R"; only stop 1 observed
    (1L, 10L, 0L, 0L, 1L, 1L, 21524L, 80000L, 80100L, 4L, 0L, 4L, 6L))

  /** Raw AVL as a fixed-width text file (with an embedded header line that
    * F1 must drop), round-tripped through the FixedWidth source. */
  def rawAvl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val data = avlRows.toDF(avlSpecs.map(_.name): _*)
      .select(FixedWidth.formatLine(avlSpecs).as("value"))
    val header = Seq("SEQ RDBRDNGS DIR QC201 ROUTE TRIP DATE ARR DEP ON OFF LOAD")
      .toDF("value")
    data.unionByName(header).write.mode("overwrite").text(s"$dir/avl_fw")
    FixedWidth.read(spark, s"$dir/avl_fw", avlSpecs)
  }

  def routeEquiv(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "MUNI", "10", "2024-01-01", "2024-02-01"),
      (1L, "MUNI", "10R", "2024-02-01", "2024-03-01"),
      (2L, "MUNI", "N", "2024-01-01", "2024-03-01")
    ).toDF("ROUTE_AVL", "AGENCY_ID", "ROUTE_SHORT_NAME", "sd", "ed")
      .withColumn("START_DATE", col("sd").cast("timestamp"))
      .withColumn("END_DATE", col("ed").cast("timestamp"))
      .drop("sd", "ed")
  }

  /** Schedule trip-stops: (DATE, ROUTE_SHORT_NAME, DIR, TRIP, SEQ,
    * SCHED_ARR minutes-since-service-midnight, SERVMILES, HEADWAY_S
    * scheduled headway in minutes, FARE). Trip 2 on route 10 is scheduled
    * but never observed (weighting target). */
  def schedule(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val jan = "2024-01-15"; val feb = "2024-02-15"
    val rows =
      (for (trip <- Seq(1L, 2L); seq <- 1L to 3L) yield {
        val base = if (trip == 1L) 480L else 500L
        (jan, "10", 0L, trip, seq, base + (seq - 1) * 5, 0.5)
      }) ++ Seq(
        (jan, "N", 0L, 7L, 1L, 1443L, 0.5),
        (feb, "10R", 0L, 1L, 1L, 480L, 0.5),
        (feb, "10R", 0L, 1L, 2L, 485L, 0.5),
        (feb, "10R", 0L, 1L, 3L, 490L, 0.5))
    rows.toDF("d", "ROUTE_SHORT_NAME", "DIR", "TRIP", "SEQ", "SCHED_ARR", "SERVMILES")
      .withColumn("SCHED_DEP", col("SCHED_ARR")) // zero scheduled dwell
      .withColumn("HEADWAY_S", lit(10.0))
      .withColumn("FARE", lit(2.5))
      .withColumn("DATE", col("d").cast("date")).drop("d")
  }

  /** Run the full pipeline; returns each stage keyed by name. */
  def run(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val cleaned = Transit.clean(rawAvl(spark, dir), routeEquiv(spark))
    val ts = Transit.expand(schedule(spark), cleaned)
    val trips = Transit.weightTrips(Transit.aggregateToTrips(ts))
    val route = Transit.routeDay(trips)
    val system = Transit.systemDay(route)
    Map("cleaned" -> cleaned, "ts" -> ts, "trips" -> trips,
      "route_day" -> route, "system_day" -> system)
  }
}
