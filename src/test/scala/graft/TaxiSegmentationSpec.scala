package graft

import graft.pipelines.Taxi
import org.apache.spark.sql.functions._

/** W5 — full 5-predicate taxi segmentation against a hand-worked fixture
  * at the REFERENCE thresholds (1 mph / 180 s stop / 300 s gap / 7500 ft
  * jump / 500 ft min trip; TaxiDataHelper.py:68-84).
  *
  * Point schedule for one cab (t seconds, x feet, y=0, status):
  *   p0  t=0    x=0      E  first point            -> trip 1
  *   p1  t=10   x=1000   E  68 mph                 -> trip 1
  *   p2  t=20   x=2000   E  68 mph                 -> trip 1
  *   p3  t=30   x=2001   E  0.07 mph; fst=10; bst=s4+s5=220>180 & fst>0
  *                          -> BREAK (last point before a stop) -> trip 2
  *   p4  t=40   x=2002   E  fst=20; bst=s5=210>180 -> BREAK     -> trip 3
  *   p5  t=250  x=2003   E  fst=230>180            -> BREAK (stop) trip 4
  *   p6  t=260  x=2600   E  40 mph (bst=340 but fst=0: NO break) trip 4
  *   p7  t=600  x=3000   E  sec=340>300            -> BREAK (gap) trip 5
  *   p8  t=610  x=11000  E  feet=8000>7500         -> BREAK (jump) trip 6
  *   p9  t=620  x=11100  M  status E->M            -> BREAK       trip 7
  *   p10 t=630  x=11200  M  6.8 mph                               trip 7
  *   p11 t=700  x=11800  M  5.8 mph                               trip 7
  *   p12 t=710  x=11805  M  fst=10; bst=s13+s14=200>180 -> BREAK  trip 8
  *   p13 t=810  x=11806  M  fst=110; bst=100: no break            trip 8
  *   p14 t=910  x=11807  M  fst=210>180            -> BREAK (stop) trip 9
  *
  * Surviving trips (num_points>1, trip_length>500):
  *   trip 1: 3 pts, 2000 ft   trip 4: 2 pts, 598 ft   trip 7: 3 pts, 800 ft
  */
class TaxiSegmentationSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val rows = Seq(
      (0, 0.0, "E"), (10, 1000.0, "E"), (20, 2000.0, "E"), (30, 2001.0, "E"),
      (40, 2002.0, "E"), (250, 2003.0, "E"), (260, 2600.0, "E"),
      (600, 3000.0, "E"), (610, 11000.0, "E"), (620, 11100.0, "M"),
      (630, 11200.0, "M"), (700, 11800.0, "M"), (710, 11805.0, "M"),
      (810, 11806.0, "M"), (910, 11807.0, "M"))
    rows.zipWithIndex.map { case ((t, x, st), i) => (1L, i.toLong, t, x, st) }
      .toDF("cab_id", "pt", "t", "x", "status")
      .withColumn("ts", to_timestamp(col("t")))
      .withColumn("y", lit(0.0))
  }

  test("all five break predicates assign the hand-derived trip ids") {
    val seg = Taxi.segmentPoints(fixture, Seq("cab_id"), "ts", "pt",
      "x", "y", "status")
    val got = seg.orderBy("pt")
      .select("trip_id", "fwd_stationary", "bwd_stationary")
      .as[(Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) ==
      Seq(1L, 1L, 1L, 2L, 3L, 4L, 4L, 5L, 6L, 7L, 7L, 7L, 8L, 8L, 9L))
    // spot-check the conditional-reset accumulators
    assert(got(3)._2 == 10.0 && got(3)._3 == 220.0)   // p3
    assert(got(5)._2 == 230.0 && got(5)._3 == 0.0)    // p5 (p6 is fast)
    assert(got(6)._2 == 0.0 && got(6)._3 == 340.0)    // p6: bst>180, fst=0
    assert(got(12)._2 == 10.0 && got(12)._3 == 200.0) // p12
    assert(got(14)._2 == 210.0)                       // p14
  }

  test("toTrips filters to the three surviving trips with exact lengths") {
    val seg = Taxi.segmentPoints(fixture, Seq("cab_id"), "ts", "pt",
      "x", "y", "status")
    val trips = Taxi.toTrips(seg, Seq("cab_id"), "ts")
      .orderBy("trip_id")
      .select("trip_id", "num_points", "trip_length")
      .as[(Long, Long, Double)].collect().toSeq
    assert(trips == Seq((1L, 3L, 2000.0), (4L, 2L, 598.0), (7L, 3L, 800.0)))
  }
}
