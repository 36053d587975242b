package graft

import graft.pipelines.MapMatch
import graft.pipelines.MapMatch.{Link, State}
import org.apache.spark.sql.functions._

/** Integrated map-matching on the planted fixture — hand-worked numbers.
  *
  * Component A (feet; ff seconds):    E(1000,1000)──5──D(2000,1000)
  *   1 A(0,0)->B(1000,0)      ff 50        │4              │3
  *   2 B->C(2000,0)           ff 50        B──────2────────C
  *   3 C->D                   ff 100       │
  *   4 B->E                   ff 100   A───1───B  (1 feeds 2 and 4)
  *   5 E->D                   ff 100
  * Turn penalties (movement = heading change): 1->2 through (0),
  * 1->4 +90° left (30), 2->3 +90° left (30), 4->5 -90° right (10).
  * Penalized inclusive skim: s(1,2)=100 s(1,3)=230 s(1,4)=180 s(1,5)=290
  *                 s(2,3)=180 s(4,5)=210; no path back from 3/5 or 4->2.
  *
  * Component B (x offset +10000, disconnected — component A's skim
  * entries are untouched): two bulges between B2(11000,0) and B5(12000,0)
  * off the spine 21 B1(10000,0)->B2, 26 B5->B6(13000,0):
  *   sharp:   22 B2->(11500,500) ff 20, 23 ->B5 ff 20   (45° headings)
  *   shallow: 24 B2->(11500,125) ff 52, 25 ->B5 ff 52   (14° headings)
  * Free-flow 21->26: sharp wins (s = 50+20+20+50 = 140). Penalized: the
  * sharp bulge pays +45° left (30) + -90° right (10) + +45° left (30)
  * = 70 s, the shallow one is all-through (|Δ| = 14°/28° < 30°): 0 s —
  * s_pen via shallow = 50+52+52+50 = 204 < 210 via sharp. The penalties
  * FLIP the chosen path; that is what trip 3 pins down.
  *
  * Trip 1: p0 (600,10) t0   -> only link1@0.6  (d 10)
  *         p1 (1080,120) t96 -> link4@0.12 (d 80), link2@0.08 (d 120),
  *                             link1@1.0 (d 144.2) — all within 150
  *         p2 (1900,40) t156 -> link2@0.9 (d 40), link3@0.04 (d 100)
  *         p3 (2050,950) t276-> link3@0.95 (d 50), link5@1.0 (d 70.7)
  * Viterbi (emit 0.5*d; trans tt + max(tt-dt, 0); limit max(60, 2*dt),
  * checked against the raw PENALIZED skim total):
  *   p1: via link2: tt=100-30-46=24, cum 5+24+60=89
  *       via link4: tt=180-30-88=62, cum 5+62+40=107 (nearer, now dearer)
  *   p2: link2@0.9 <- link2@0.08 (same link, tt=41): 89+41+20=150
  *       (from link4: unreachable; link3@0.04: s(2,3)=180 > limit 120)
  *   p3: link3@0.95 <- link2@0.9: s(2,3)=180 <= limit 240,
  *       tt=180-45-5=130, cost 130+max(130-120,0)=140: 150+140+25
  *       (link5: unreachable) -> backtrack snaps p1 to link2@0.08.
  * Legs: [1,2] 0.6->0.08: ff 20/4, dt 96 -> tt 80/16
  *       [2]   0.08->0.9:  ff 41, dt 60 -> tt 60
  *       [2,3] 0.9->0.95:  ff 5/95, dt 120 -> tt 6/114
  * Merge: link1 (0.4, 80, t 0); link2 (1.0, 16+60+6=82, t 80);
  *        link3 (0.95, 114, t 162).
  *
  * Trip 2: (200,5) t1000 -> link1@0.2; (1800,5) t1100 -> link2@0.8;
  *         stationary repeat t1150 (same state -> leg skipped).
  * Leg [1,2] 0.2->0.8: ff 40/40, dt 100 -> tt 50/50.
  *
  * Trip 3: (10600,10) t2000 -> link21@0.6; (12600,10) t2154 -> link26@0.6.
  * Single candidates; path = penalized-best [21,24,25,26] (free-flow
  * would be [21,22,23,26]). s_pen(21,26)=204 <= limit 308;
  * leg ff parts 20/52/52/30 (tot 154), dt 154 -> tts 20/52/52/30;
  * starts 2000/2020/2072/2124.
  */
class MapMatchSpec extends SparkSpec {
  import spark.implicits._

  private val links = Seq(
    Link(1L, 0, 0, 1000, 0, 50), Link(2L, 1000, 0, 2000, 0, 50),
    Link(3L, 2000, 0, 2000, 1000, 100), Link(4L, 1000, 0, 1000, 1000, 100),
    Link(5L, 1000, 1000, 2000, 1000, 100),
    Link(21L, 10000, 0, 11000, 0, 50),
    Link(22L, 11000, 0, 11500, 500, 20), Link(23L, 11500, 500, 12000, 0, 20),
    Link(24L, 11000, 0, 11500, 125, 52), Link(25L, 11500, 125, 12000, 0, 52),
    Link(26L, 12000, 0, 13000, 0, 50))
  private lazy val ffSkim = MapMatch.linkSkim(links)
  private lazy val skim = MapMatch.linkSkimPenalized(
    links, MapMatch.geometricMovements(links))
  private val byId = links.map(l => l.linkId -> l).toMap

  test("turnPenalty: heading-change bands incl. U-turn") {
    val east  = Link(90L, 0, 0, 100, 0, 1)
    val north = Link(91L, 100, 0, 100, 100, 1)
    val south = Link(92L, 100, 0, 100, -100, 1)
    val west  = Link(93L, 100, 0, 0, 0, 1)
    val shallow = Link(94L, 100, 0, 200, 25, 1) // ~14°
    assert(MapMatch.turnPenalty(east, north) == MapMatch.LeftTurnPenalty)
    assert(MapMatch.turnPenalty(east, south) == MapMatch.RightTurnPenalty)
    assert(MapMatch.turnPenalty(east, west) == MapMatch.UTurnPenalty)
    assert(MapMatch.turnPenalty(east, shallow) == 0.0)
    // wrap-around: heading -135° onto +135° is a -90° right, not a +270 left
    val se = Link(95L, 0, 0, -100, -100, 1)
    val sw = Link(96L, -100, -100, -200, 0, 1)
    assert(MapMatch.turnPenalty(se, sw) == MapMatch.RightTurnPenalty)
  }

  test("linkSkim: inclusive free-flow times and link sequences") {
    assert(ffSkim((1L, 2L)) == ((100.0, Vector(1L, 2L))))
    assert(ffSkim((1L, 3L)) == ((200.0, Vector(1L, 2L, 3L))))
    assert(ffSkim((1L, 5L)) == ((250.0, Vector(1L, 4L, 5L))))
    assert(ffSkim((1L, 1L))._1 == 50.0)
    assert(!ffSkim.contains((4L, 2L)) && !ffSkim.contains((3L, 1L)))
  }

  test("linkSkimPenalized: penalties reprice and can FLIP the best path") {
    assert(skim((1L, 2L)) == ((100.0, Vector(1L, 2L))))    // through: free
    assert(skim((1L, 3L)) == ((230.0, Vector(1L, 2L, 3L)))) // +30 left
    assert(skim((1L, 5L)) == ((290.0, Vector(1L, 4L, 5L)))) // +30+10
    // the discriminating pair: free-flow takes the sharp bulge, the
    // penalized skim the through-graded shallow one
    assert(ffSkim((21L, 26L)) == ((140.0, Vector(21L, 22L, 23L, 26L))))
    assert(skim((21L, 26L)) == ((204.0, Vector(21L, 24L, 25L, 26L))))
    // movements as restrictions: dropping 22's onward movement severs it
    val restricted = MapMatch.linkSkimPenalized(links,
      MapMatch.geometricMovements(links).filterNot(_ == (22L, 23L)))
    assert(restricted((21L, 26L))._2 == Vector(21L, 24L, 25L, 26L))
    assert(!restricted.contains((22L, 23L)))
  }

  private def pts = Seq(
    ("1", 0L, 0.0, 600.0, 10.0), ("1", 1L, 96.0, 1080.0, 120.0),
    ("1", 2L, 156.0, 1900.0, 40.0), ("1", 3L, 276.0, 2050.0, 950.0),
    ("2", 0L, 1000.0, 200.0, 5.0), ("2", 1L, 1100.0, 1800.0, 5.0),
    ("2", 2L, 1150.0, 1800.0, 5.0),
    ("3", 0L, 2000.0, 10600.0, 10.0), ("3", 1L, 2154.0, 12600.0, 10.0)
  ).toDF("trip", "pt", "ts", "x", "y")

  test("candidateStates: projection, clamping, rank by distance") {
    val c = MapMatch.candidateStates(pts, links, "trip", "pt", "x", "y")
      .select("trip", "pt", "cand_rank", "link_id", "offset_ratio", "cand_dist")
      .as[(String, Long, Int, Long, Double, Double)].collect()
      .groupBy(r => (r._1, r._2))
    // p1 of trip 1: link4 nearest (80), then link2 (120), then link1
    // clamped to its end (sqrt(80^2+120^2) ~ 144.2)
    val p1 = c(("1", 1L)).sortBy(_._3).map(r => (r._4, r._5, r._6)).toSeq
    assert(p1.map(_._1) == Seq(4L, 2L, 1L))
    assert(p1(0)._2 == 0.12 && p1(0)._3 == 80.0)
    assert(p1(1)._2 == 0.08 && p1(1)._3 == 120.0)
    assert(p1(2)._2 == 1.0)
    // p3: link5's projection clamps to its endpoint D
    val p3 = c(("1", 3L)).sortBy(_._3).map(_._4).toSeq
    assert(p3 == Seq(3L, 5L))
    // trip 2 points have a single candidate each
    assert(c(("2", 0L)).map(_._4).toSeq == Seq(1L))
    // trip 3 points: single candidates on the component-B spine
    assert(c(("3", 0L)).map(_._4).toSeq == Seq(21L))
    assert(c(("3", 1L)).map(_._4).toSeq == Seq(26L))
  }

  test("viterbiLegs: the path structure overrides the nearest projection") {
    val cands = MapMatch.candidateStates(pts, links, "trip", "pt", "x", "y")
    val legs = MapMatch.viterbiLegs(cands, "trip", "pt", "ts", skim, byId)
      .collect().groupBy(_.trip)
    val t1 = legs("1").sortBy(_.leg)
    assert(t1.map(_.links.toVector).toSeq ==
      Seq(Vector(1L, 2L), Vector(2L), Vector(2L, 3L)))
    assert(t1(0).startRatio == 0.6 && t1(0).endRatio == 0.08)
    assert(t1(1).startRatio == 0.08 && t1(1).endRatio == 0.9)
    assert(t1(2).startRatio == 0.9 && t1(2).endRatio == 0.95)
    assert(t1.forall(_.moved))
    // trip 2: the stationary leg is marked unmoved
    val t2 = legs("2").sortBy(_.leg)
    assert(t2.map(_.moved).toSeq == Seq(true, false))
    // trip 3: the leg takes the penalty-best shallow bulge, NOT the
    // free-flow-best sharp one — turn penalties decide the matched path
    val t3 = legs("3").sortBy(_.leg)
    assert(t3.map(_.links.toVector).toSeq ==
      Seq(Vector(21L, 24L, 25L, 26L)))
  }

  test("allocation + consecutive-link merge + stats match the derivation") {
    val cands = MapMatch.candidateStates(pts, links, "trip", "pt", "x", "y")
    val legs = MapMatch.viterbiLegs(cands, "trip", "pt", "ts", skim, byId)
    val trav = MapMatch.allocateTravelTimes(legs, links)
    val rows = trav.orderBy("trip", "run")
      .select(col("trip"), col("link_id"), round(col("traversal_ratio"), 9),
        round(col("travel_time"), 9), col("start_ts").cast("long"))
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(rows == Seq(
      ("1", 1L, 0.4, 80.0, 0L), ("1", 2L, 1.0, 82.0, 80L),
      ("1", 3L, 0.95, 114.0, 162L),
      ("2", 1L, 0.8, 50.0, 1000L), ("2", 2L, 0.8, 50.0, 1050L),
      ("3", 21L, 0.4, 20.0, 2000L), ("3", 24L, 1.0, 52.0, 2020L),
      ("3", 25L, 1.0, 52.0, 2072L), ("3", 26L, 0.6, 30.0, 2124L)))
    val stats = MapMatch.linkStats(trav).orderBy("link_id")
      .select(col("link_id"), col("observations"), round(col("tt_mean"), 6),
        round(col("tt_std"), 6), round(col("tt_95"), 6))
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(stats == Seq((1L, 1L, 62.5, 0.0, 62.5),
      (2L, 2L, 72.25, 9.75, 81.025), (3L, 1L, 120.0, 0.0, 120.0),
      (24L, 1L, 52.0, 0.0, 52.0), (25L, 1L, 52.0, 0.0, 52.0)))
  }
}
