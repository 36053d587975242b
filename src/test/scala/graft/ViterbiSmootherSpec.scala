package graft

import graft.graph.Viterbi
import graft.pipelines.MapMatch
import graft.pipelines.MapMatch.Link
import org.apache.spark.sql.functions._

/** Forward-backward smoother (Viterbi.smooth) — the reference's optional
  * TrajectorySmoother1 pass (Trajectory.py:220-235). Oracles: a
  * hand-solved 3-point HMM, an independent brute-force path enumeration,
  * and the map-matching fixture via MapMatch.viterbiPosteriors. */
class ViterbiSmootherSpec extends SparkSpec {
  import spark.implicits._

  test("hand-solved 3-point HMM: independent per-step softmax") {
    // state 0 forced at t0 (emit inf on state 1); all transitions free;
    // states at t1/t2 weighted 1 vs 1/3 -> posterior 0.75 / 0.25 each
    val e = Array(
      Array(0.0, Double.PositiveInfinity),
      Array(0.0, math.log(3.0)),
      Array(0.0, math.log(3.0)))
    val g = Viterbi.smooth(3, _ => 2, (t, s) => e(t)(s), (_, _, _) => 0.0)
    assert(g(0)(0) == 1.0 && g(0)(1) == 0.0)
    for (t <- 1 to 2) {
      assert(math.abs(g(t)(0) - 0.75) < 1e-9)
      assert(math.abs(g(t)(1) - 0.25) < 1e-9)
    }
  }

  test("matches brute-force path enumeration, including inf transitions") {
    val nStates = Array(2, 3, 2)
    def emit(t: Int, s: Int): Double = (t + 1) * 0.7 + s * 1.3
    def trans(t: Int, a: Int, b: Int): Double =
      if (t == 2 && a == 2 && b == 0) Double.PositiveInfinity
      else 0.4 * t + 0.9 * a + 0.2 * b
    // independent oracle: enumerate all 2*3*2 paths, weight exp(-cost),
    // marginalize
    val paths = for {
      s0 <- 0 until 2; s1 <- 0 until 3; s2 <- 0 until 2
    } yield {
      val c = emit(0, s0) + trans(1, s0, s1) + emit(1, s1) +
        trans(2, s1, s2) + emit(2, s2)
      (Seq(s0, s1, s2), math.exp(-c))
    }
    val z = paths.map(_._2).sum
    val g = Viterbi.smooth(3, nStates(_), emit, trans)
    for (t <- 0 until 3; s <- 0 until nStates(t)) {
      val expected = paths.filter(_._1(t) == s).map(_._2).sum / z
      assert(math.abs(g(t)(s) - expected) < 1e-9,
        s"gamma($t)($s): ${g(t)(s)} vs $expected")
    }
    // rows are proper distributions
    for (t <- 0 until 3)
      assert(math.abs(g(t).sum - 1.0) < 1e-9)
  }

  test("viterbiPosteriors on the map-matching fixture") {
    val links = Seq(
      Link(1L, 0, 0, 1000, 0, 50), Link(2L, 1000, 0, 2000, 0, 50),
      Link(3L, 2000, 0, 2000, 1000, 100), Link(4L, 1000, 0, 1000, 1000, 100),
      Link(5L, 1000, 1000, 2000, 1000, 100),
      Link(21L, 10000, 0, 11000, 0, 50),
      Link(22L, 11000, 0, 11500, 500, 20), Link(23L, 11500, 500, 12000, 0, 20),
      Link(24L, 11000, 0, 11500, 125, 52), Link(25L, 11500, 125, 12000, 0, 52),
      Link(26L, 12000, 0, 13000, 0, 50))
    val skim = MapMatch.linkSkimPenalized(
      links, MapMatch.geometricMovements(links))
    val byId = links.map(l => l.linkId -> l).toMap
    val pts = Seq(
      ("1", 0L, 0.0, 600.0, 10.0), ("1", 1L, 96.0, 1080.0, 120.0),
      ("1", 2L, 156.0, 1900.0, 40.0), ("1", 3L, 276.0, 2050.0, 950.0),
      ("3", 0L, 2000.0, 10600.0, 10.0), ("3", 1L, 2154.0, 12600.0, 10.0)
    ).toDF("trip", "pt", "ts", "x", "y")
    val cands = MapMatch.candidateStates(pts, links, "trip", "pt", "x", "y")
    val post = MapMatch.viterbiPosteriors(
        cands, "trip", "pt", "ts", skim, byId)
      .select("trip", "pt", "link_id", "prob")
      .as[(String, Long, Long, Double)].collect()
    val byPt = post.groupBy(r => (r._1, r._2))
    // trip 3: single candidate per point -> certainty
    assert(byPt(("3", 0L)).map(_._4).toSeq == Seq(1.0))
    assert(byPt(("3", 1L)).map(_._4).toSeq == Seq(1.0))
    // trip 1 p1: link 4 is the NEAREST candidate but has no finite
    // continuation to p2 -> posterior exactly 0; the smoother
    // quantifies what the decode could only assert
    val p1 = byPt(("1", 1L)).map(r => r._3 -> r._4).toMap
    assert(p1(4L) == 0.0)
    assert(p1(2L) > p1(1L) && p1(1L) > 0.0)
    // every reachable point's probabilities sum to 1
    byPt.values.foreach { rs =>
      val s = rs.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-9 || s == 0.0)
    }
  }
}
