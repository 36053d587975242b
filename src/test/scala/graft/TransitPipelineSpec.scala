package graft

import graft.pipelines.TransitFixture
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Golden end-to-end test of the clean -> expand -> aggregate pipeline on
  * the deterministic fixture. Every expected number below is derived by
  * hand from the fixture definition (see TransitFixture scaladoc).
  */
class TransitPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val stages =
    TransitFixture.run(spark, Files.createTempDirectory("graft_transit").toString)

  test("clean: filters, dedup, service-day parse, route-equiv by validity window") {
    val c = stages("cleaned").cache()
    // 8 raw rows + header: header dropped (F1), QC row + DIR=6 dropped (F3),
    // duplicate removed (F8) -> 5 survivors
    assert(c.count() == 5)
    // route rename: route 1 maps to "10" in January and "10R" in February
    val names = c.select(col("DATE").cast("string"), col("ROUTE_AVL"), col("ROUTE_SHORT_NAME"))
      .distinct().as[(String, Long, String)].collect().toSet
    assert(names.contains(("2024-01-15", 1L, "10")))
    assert(names.contains(("2024-02-15", 1L, "10R")))
    // post-midnight arrival rolled to next calendar day, same service date
    val wrap = c.where(col("ROUTE_AVL") === 2)
      .select(col("ARRIVAL_TIME").cast("string")).as[String].collect()(0)
    assert(wrap == "2024-01-16 00:05:00")
  }

  test("expand: left join keeps unobserved schedule rows; deviation/ontime/masking") {
    val ts = stages("ts").cache()
    assert(ts.count() == 10) // 6 (jan "10") + 1 (N) + 3 (feb "10R") scheduled
    // trip 2 on route 10 never observed -> OBSERVED=0, measures null
    val unobs = ts.where(col("TRIP") === 2 && col("ROUTE_SHORT_NAME") === "10")
    assert(unobs.count() == 3)
    assert(unobs.where(col("OBSERVED") === 0 && col("ARRIVAL_DEV").isNull).count() == 3)
    // trip 1 deviations: arr 08:02:30/08:07/08:16 vs sched 480/485/490 ->
    // +2.5 (fractional-minute!), +2, +6
    val devs = ts.where(col("TRIP") === 1 && col("ROUTE_SHORT_NAME") === "10")
      .orderBy("SEQ").select("ARRIVAL_DEV").as[Double].collect().toSeq
    assert(devs == Seq(2.5, 2.0, 6.0))
    // E5 measure family on trip 1 (LOAD_ARR = 0/5/6, RUNTIME = 0/4/8,
    // DWELL = 0/1/1, HEADWAY_S = 10, FARE = 2.5, CAPACITY = 6):
    val m = ts.where(col("TRIP") === 1 && col("ROUTE_SHORT_NAME") === "10")
      .orderBy("SEQ")
      .select("PASSMILES", "PASSHOURS", "WAITHOURS", "FULLFARE_REV",
        "PASSDELAY_DEP", "PASSDELAY_ARR", "VC", "CROWDED", "CROWDHOURS")
      .as[(Double, Double, Double, Double, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(m(0) == ((0.0, 0.0, 25.0 / 60, 12.5, 15.0, 12.5, 0.0, 0.0, 0.0)))
    assert(m(1) == ((2.5, 26.0 / 60, 10.0 / 60, 5.0, 6.0, 4.0, 5.0 / 6, 0.0, 0.0)))
    assert(m(2) == ((3.0, 48.0 / 60, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 48.0 / 60)))
    // wraparound stop: arrMin 24*60+5 = 1445 vs sched 1443 -> +2, ontime
    val nDev = ts.where(col("ROUTE_SHORT_NAME") === "N")
      .select("ARRIVAL_DEV", "ONTIME5").as[(Double, Int)].collect()(0)
    assert(nDev == ((2.0, 1)))
  }

  test("trips: A1 rule aggregation and W8 weighting") {
    val trips = stages("trips").cache()
    val t1 = trips.where(col("ROUTE_SHORT_NAME") === "10" && col("TRIP") === 1)
      .select("TRIP_STOPS", "OBS_TRIP_STOPS", "ON", "RUNTIME", "ONTIME5", "TRIP_WEIGHT")
      .as[(Long, Long, Long, Double, Double, Double)].collect()(0)
    assert(t1._1 == 3 && t1._2 == 3 && t1._3 == 7)
    assert(t1._4 == 12.0) // 0 + (8:07-8:03) + (8:16-8:08) minutes
    assert(math.abs(t1._5 - 2.0 / 3) < 1e-12)
    // 2 scheduled trips, 1 observed -> weight 2
    assert(t1._6 == 2.0)
    // unobserved trip has null weight
    assert(trips.where(col("TRIP") === 2).select("TRIP_WEIGHT").collect()(0).isNullAt(0))
    // first/last/min/max/countDistinct rules (SEQ-ordered)
    val t1b = trips.where(col("ROUTE_SHORT_NAME") === "10" && col("TRIP") === 1)
      .select(col("N_SEQS"), col("MAX_LOAD"),
        col("FIRST_ARR").cast("string"), col("LAST_ARR").cast("string"))
      .as[(Long, Long, String, String)].collect()(0)
    assert(t1b == ((3L, 6L, "2024-01-15 08:02:30", "2024-01-15 08:16:00")))
    // trip-level E5 rollups: sums, and max for the crowding family
    val t1c = trips.where(col("ROUTE_SHORT_NAME") === "10" && col("TRIP") === 1)
      .select("PASSHOURS", "WAITHOURS", "FULLFARE_REV",
        "PASSDELAY_DEP", "PASSDELAY_ARR", "VC", "CROWDED", "CROWDHOURS")
      .as[(Double, Double, Double, Double, Double, Double, Double, Double)]
      .collect()(0)
    assert(t1c._1 == 26.0 / 60 + 48.0 / 60 && t1c._2 == 25.0 / 60 + 10.0 / 60)
    assert(t1c._3 == 17.5 && t1c._4 == 21.0 && t1c._5 == 16.5)
    assert(t1c._6 == 1.0 && t1c._7 == 1.0 && t1c._8 == 48.0 / 60)
  }

  test("route_day and system_day: weighted cascade") {
    val route = stages("route_day").cache()
    val r10 = route.where(col("ROUTE_SHORT_NAME") === "10")
      .select("TRIPS", "ON", "RUNTIME", "ONTIME5", "PASSMILES")
      .as[(Double, Double, Double, Double, Double)].collect()(0)
    assert(r10 == ((2.0, 14.0, 24.0, 2.0 / 3, 11.0)))
    val sys = stages("system_day")
      .where(col("DATE") === lit("2024-01-15").cast("date"))
      .select("TRIPS", "ON", "ONTIME5", "PASSMILES")
      .as[(Double, Double, Double, Double)].collect()(0)
    assert(sys._1 == 3.0 && sys._2 == 17.0 && sys._4 == 11.0)
    assert(math.abs(sys._3 - 7.0 / 9) < 1e-12) // (2/3*2 + 1*1)/3
    // system-day E5 family: weighted sums over (trip1 x2, tripN x1)
    val sysM = stages("system_day")
      .where(col("DATE") === lit("2024-01-15").cast("date"))
      .select("PASSHOURS", "WAITHOURS", "FULLFARE_REV",
        "PASSDELAY_DEP", "PASSDELAY_ARR", "VC", "CROWDED", "CROWDHOURS")
      .as[(Double, Double, Double, Double, Double, Double, Double, Double)]
      .collect()(0)
    assert(math.abs(sysM._1 - 148.0 / 60) < 1e-12)          // riding+dwelling
    assert(math.abs(sysM._2 - (70.0 / 60 + 0.25)) < 1e-12)  // waiting
    assert(sysM._3 == 42.5 && sysM._4 == 51.0 && sysM._5 == 39.0)
    assert(math.abs(sysM._6 - 2.0 / 3) < 1e-12)             // VC wgtAvg
    assert(math.abs(sysM._7 - 2.0 / 3) < 1e-12)             // CROWDED wgtAvg
    assert(math.abs(sysM._8 - 1.6) < 1e-12)                 // CROWDHOURS
  }
}
