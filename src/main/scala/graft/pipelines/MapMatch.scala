package graft.pipelines

import graft.graph.{Graph, Viterbi}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G1+G3+G4+G5 — the reference's integrated taxi map-matching chain
  * (sftaxi_wrangler.py:172-204): GPS trip points -> candidate link states
  * (HwyNetwork.py:297-330) -> HMM most-likely trajectory over candidate
  * paths from the link skim (Trajectory.py:37-97,180-235) -> observed
  * travel time allocated to links with the consecutive-link merge
  * (HwyNetwork.py:569-610, TaxiDataHelper.py:402-485) -> link travel-time
  * stats (TaxiDataHelper.py:489-541).
  *
  * Execution model: the network is config-scale (10^3-10^4 links — the
  * reference holds it in memory per process) so link geometry and the
  * all-pairs link skim are DRIVER-side and broadcast; GPS points are
  * data-scale and stay distributed throughout. The only non-relational
  * stage is the per-trip Viterbi DP (`mapGroups` over trips, kernel in
  * graph/Viterbi.scala); projection, allocation, merge, and stats are
  * window/groupBy relational plans.
  *
  * Skim convention: skim(s, e) = free-flow seconds over the best link
  * sequence s..e INCLUSIVE of both endpoint links' full traversal, so the
  * partial-traversal path time
  *   tt = skim - startOffsetRatio*ff(s) - (1 - endOffsetRatio)*ff(e)
  * is exact and non-negative. (The reference's skim costs each movement at
  * the INCOMING link's time — diagonal 0, destination link excluded — which
  * drives the same formula negative by ff(e) on every path
  * (HwyNetwork.py:266,513-529); we keep the subtraction formula but feed it
  * the inclusive skim so it means what it says.)
  */
object MapMatch {

  /** Reference constants (HwyNetwork.py:117-141, Trajectory.py:95). */
  val ProjectNumLinks   = 5
  val ProjectDistLimit  = 150.0
  val TimeLimitFactor   = 2.0
  val TimeLimitMinimum  = 60.0
  val ThetaPath         = 1.0
  val ThetaPoint        = 0.5

  /** Turn penalties, seconds (HwyNetwork.py:129-141): applied per
    * MOVEMENT when building the link-to-link skim, they discourage
    * zig-zag paths through a grid network. */
  val LeftTurnPenalty   = 30.0
  val RightTurnPenalty  = 10.0
  val UTurnPenalty      = 60.0

  /** A directed road link: endpoint coordinates (planar feet) and
    * free-flow traversal seconds. */
  final case class Link(linkId: Long, ax: Double, ay: Double,
      bx: Double, by: Double, ffSec: Double) {
    def len: Double = math.hypot(bx - ax, by - ay)
  }

  /** Candidate state for one GPS point. */
  final case class State(linkId: Long, offsetRatio: Double, dist: Double)

  /** One matched leg between consecutive GPS points: the chosen path's
    * link sequence plus the offset ratios on its first/last links.
    * `moved` = false when start and end states coincide (the reference
    * skips those legs in allocation, TaxiDataHelper.py:425-427). */
  final case class Leg(trip: String, leg: Int, tStart: Double, tEnd: Double,
      links: Seq[Long], startRatio: Double, endRatio: Double, moved: Boolean)

  /** Heading change from `in` to `out`, degrees in (-180, 180]:
    * positive = counterclockwise = a left turn when +y is north. */
  private def headingChange(in: Link, out: Link): Double = {
    val d = math.toDegrees(
      math.atan2(out.by - out.ay, out.bx - out.ax) -
        math.atan2(in.by - in.ay, in.bx - in.ax))
    if (d > 180) d - 360 else if (d <= -180) d + 360 else d
  }

  /** Movement turn classification from link geometry (the dta package's
    * isLeftTurn/isRightTurn/isUTurn consulted by HwyNetwork.py:267-276,
    * re-derived as heading-change bands): |Δ| >= 150° is a U-turn,
    * Δ >= 30° a left, Δ <= -30° a right, anything shallower a through
    * movement with no penalty. */
  def turnPenalty(in: Link, out: Link): Double = {
    val d = headingChange(in, out)
    if (math.abs(d) >= 150) UTurnPenalty
    else if (d >= 30) LeftTurnPenalty
    else if (d <= -30) RightTurnPenalty
    else 0.0
  }

  /** Every geometrically possible movement (u ends where v starts) — the
    * fallback when a network carries no explicit MOVEMENTS section. */
  def geometricMovements(links: Seq[Link]): Seq[(Long, Long)] =
    for {
      u <- links; v <- links
      if u.linkId != v.linkId && u.bx == v.ax && u.by == v.ay
    } yield (u.linkId, v.linkId)

  /** Driver-side all-pairs link skim over the link-adjacency graph
    * (links u->v connected iff u ends where v starts), free-flow time
    * only: total seconds s..e inclusive, plus the link sequence.
    * Guarded: this is the reference's in-memory network regime, not a
    * data-scale structure. */
  def linkSkim(links: Seq[Link], maxLinks: Int = 3000)
      : Map[(Long, Long), (Double, Vector[Long])] =
    skimOver(links, geometricMovements(links), penalized = false, maxLinks)

  /** The reference's actual skim shape (HwyNetwork.py:227-294): edges are
    * the network's MOVEMENTS — a movement absent from the list is a turn
    * RESTRICTION and contributes no edge — and each movement pays its
    * turn penalty (left 30 s / right 10 s / U 60 s) on top of free-flow
    * time. Penalties ride the movement edge, so the inclusive-skim
    * offset-subtraction formula used by viterbiLegs is unchanged. */
  def linkSkimPenalized(
      links: Seq[Link], movements: Seq[(Long, Long)], maxLinks: Int = 3000)
      : Map[(Long, Long), (Double, Vector[Long])] =
    skimOver(links, movements, penalized = true, maxLinks)

  private def skimOver(
      links: Seq[Link], movements: Seq[(Long, Long)], penalized: Boolean,
      maxLinks: Int): Map[(Long, Long), (Double, Vector[Long])] = {
    // the bound reflects what dense APSP + materialized path vectors can
    // actually do on a driver (n^3 relax steps, up to n^2 stored paths):
    // ~3k links = ~27e9 relaxations and a few GB of paths, the ceiling of
    // the reference's own in-memory regime — NOT a data-scale structure
    require(links.size <= maxLinks,
      s"linkSkim is a driver-side dense APSP for config-scale networks; " +
        s"got ${links.size} links > $maxLinks")
    val ids = links.map(_.linkId).toVector
    val idx = ids.zipWithIndex.toMap
    val byId = links.map(l => l.linkId -> l).toMap
    // edge u->v weighted by ff(v) (+ turn penalty u->v when penalized);
    // skim(s,e) = ff(s) + dist(s,e)
    val edges = movements.collect {
      case (u, v) if u != v && idx.contains(u) && idx.contains(v) =>
        val pen = if (penalized) turnPenalty(byId(u), byId(v)) else 0.0
        (idx(u), idx(v), byId(v).ffSec + pen)
    }
    val (dist, pred) = Graph.floydWarshall(ids.size, edges)
    val INF = Double.MaxValue / 8
    val out = for {
      s <- ids.indices; e <- ids.indices
      if dist(s)(e) < INF
    } yield {
      // trace e back to s through the predecessor matrix
      var seq = List(ids(e))
      var j = e
      while (j != s) { j = pred(s)(j); seq = ids(j) :: seq }
      (ids(s), ids(e)) -> (byId(ids(s)).ffSec + dist(s)(e), seq.toVector)
    }
    out.toMap
  }

  /** G1 — candidate link states per GPS point, relationally: each point
    * is projected only onto the links sharing its `distLimit`-sized grid
    * cell, then the `n` nearest within `distLimit` are kept, ranked by
    * (distance, link_id) for a total order (HwyNetwork.py:297-330: offset
    * t along the segment clamped to [0,1], perpendicular distance).
    *
    * Grid pruning (the Spark-shaped version of the reference's rtree bbox
    * probe, HwyNetwork.py:370-388): every link is replicated on the
    * driver to each cell overlapped by its bbox expanded by `distLimit`.
    * A point within `distLimit` of a segment lies inside that expanded
    * bbox, so its own cell is in the link's replication set — the
    * (cell_x, cell_y) equi-join is therefore EXACT (a superset of the
    * true candidates, refined by the distance filter) and plans as a
    * BroadcastHashJoin: per-point work is the links near its cell, not
    * the whole network.
    * `points` must carry (tripCol, ptCol, tsCol, xCol, yCol).
    */
  def candidateStates(
      points: DataFrame, links: Seq[Link], tripCol: String, ptCol: String,
      xCol: String, yCol: String,
      n: Int = ProjectNumLinks, distLimit: Double = ProjectDistLimit): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val cell = distLimit
    // replicate each link to the cells of its expanded bbox, PRUNED to
    // the segment's corridor: a long diagonal link's bbox is quadratic
    // in cells while the link passes near only a linear band of them.
    // Keep a cell iff its center is within distLimit + half-diagonal of
    // the segment — any point of the cell within distLimit of the link
    // puts the center inside that radius, so the kept set is a strict
    // superset of the cells that can ever satisfy the distance refine
    // (exactness unchanged, replication linear in link length).
    def segDist(px: Double, py: Double, l: Link): Double = {
      val dx = l.bx - l.ax; val dy = l.by - l.ay
      val len2 = dx * dx + dy * dy
      val t = if (len2 == 0) 0.0
        else math.max(0.0, math.min(1.0,
          ((px - l.ax) * dx + (py - l.ay) * dy) / len2))
      math.hypot(px - (l.ax + t * dx), py - (l.ay + t * dy))
    }
    val corridor = distLimit + cell * math.sqrt(2) / 2
    val linkDf = links.flatMap { l =>
      val x0 = math.floor((math.min(l.ax, l.bx) - distLimit) / cell).toLong
      val x1 = math.floor((math.max(l.ax, l.bx) + distLimit) / cell).toLong
      val y0 = math.floor((math.min(l.ay, l.by) - distLimit) / cell).toLong
      val y1 = math.floor((math.max(l.ay, l.by) + distLimit) / cell).toLong
      for {
        cx <- x0 to x1; cy <- y0 to y1
        if segDist((cx + 0.5) * cell, (cy + 0.5) * cell, l) <= corridor
      } yield (l.linkId, l.ax, l.ay, l.bx, l.by, l.len, cx, cy)
    }.toDF("link_id", "ax", "ay", "bx", "by", "len", "__gcx", "__gcy")
    val t0 = (((col(xCol) - col("ax")) * (col("bx") - col("ax")) +
               (col(yCol) - col("ay")) * (col("by") - col("ay"))) /
              (col("len") * col("len")))
    val t = least(greatest(t0, lit(0.0)), lit(1.0))
    val px = col("ax") + t * (col("bx") - col("ax"))
    val py = col("ay") + t * (col("by") - col("ay"))
    val dist = sqrt(pow(col(xCol) - px, 2) + pow(col(yCol) - py, 2))
    val w = Window.partitionBy(col(tripCol), col(ptCol))
      .orderBy(col("cand_dist"), col("link_id"))
    points
      .withColumn("__gcx", floor(col(xCol) / cell).cast("long"))
      .withColumn("__gcy", floor(col(yCol) / cell).cast("long"))
      .join(broadcast(linkDf), Seq("__gcx", "__gcy"))
      .withColumn("cand_dist", dist)
      .where(col("cand_dist") <= distLimit)
      .withColumn("offset_ratio", t)
      .withColumn("cand_rank", row_number().over(w))
      .where(col("cand_rank") <= n)
      .drop("ax", "ay", "bx", "by", "len", "__gcx", "__gcy")
  }

  /** G4 — most-likely trajectory per trip via the Viterbi kernel, one
    * `mapGroups` per trip (distributed across trips): point score =
    * -distFromGPS (weight ThetaPoint), path score = -(path_tt +
    * max(path_tt - observed_dt, 0)) (weight ThetaPath; the
    * double-penalty for paths slower than observed, Trajectory.py:62-85),
    * candidate paths excluded beyond max(TimeLimitMinimum,
    * TimeLimitFactor * observed_dt) free-flow seconds
    * (HwyNetwork.py:471-474). Emits one Leg per consecutive point pair.
    *
    * `cands` must carry (tripCol, ptCol string-sortable, ts epoch double
    * `tsCol`, link_id, offset_ratio, cand_dist, cand_rank).
    */
  /** Per-trip observation assembly: points in time order with the point
    * id as tie-break (duplicate GPS timestamps are common; hash-map order
    * must not leak into the decoded path); candidates in rank order. */
  private def assemblePts(
      it: Iterator[(String, Long, Double, Long, Double, Double, Int)])
      : Array[(Long, Double, Array[State])] =
    it.toArray.groupBy(r => (r._2, r._3)).toArray
      .sortBy { case ((pt, ts), _) => (ts, pt) }
      .map { case ((pt, ts), rs) =>
        (pt, ts, rs.sortBy(_._7).map(r => State(r._4, r._5, r._6)))
      }

  /** The shared HMM cost structure: emit = ThetaPoint * GPS distance,
    * trans = ThetaPath * (path_tt + max(path_tt - observed_dt, 0)) —
    * used identically by the decode and the smoother, exactly as the
    * reference feeds one LearningTrajectory to both TrajectoryViterbi1
    * and TrajectorySmoother1 (Trajectory.py:188-235). */
  private def costFns(
      pts: Array[(Long, Double, Array[State])],
      skimM: Map[(Long, Long), (Double, Vector[Long])],
      linkM: Map[Long, Link])
      : ((Int, Int) => Double, (Int, Int, Int) => Double) = {
    // path free-flow tt between two states; +inf when no path or over
    // the time limit. Same-link paths clamp the end offset forward
    // (HwyNetwork.py:404-410) and bypass the limit.
    def pathTT(a: State, b: State, dt: Double): Double =
      if (a.linkId == b.linkId) {
        val ff = linkM(a.linkId).ffSec
        (math.max(a.offsetRatio, b.offsetRatio) - a.offsetRatio) * ff
      } else skimM.get((a.linkId, b.linkId)) match {
        case Some((tt, _))
          if tt <= math.max(TimeLimitMinimum, TimeLimitFactor * dt) =>
          tt - a.offsetRatio * linkM(a.linkId).ffSec -
            (1.0 - b.offsetRatio) * linkM(b.linkId).ffSec
        case _ => Double.PositiveInfinity
      }
    val emit = (t: Int, s: Int) => ThetaPoint * pts(t)._3(s).dist
    val trans = (t: Int, s1: Int, s2: Int) => {
      val dt = pts(t)._2 - pts(t - 1)._2
      val tt = pathTT(pts(t - 1)._3(s1), pts(t)._3(s2), dt)
      ThetaPath * (tt + math.max(tt - dt, 0.0))
    }
    (emit, trans)
  }

  def viterbiLegs(
      cands: DataFrame, tripCol: String, ptCol: String, tsCol: String,
      skim: Map[(Long, Long), (Double, Vector[Long])],
      linksById: Map[Long, Link]): Dataset[Leg] = {
    val spark = cands.sparkSession
    import spark.implicits._
    val bcSkim = spark.sparkContext.broadcast(skim)
    val bcLinks = spark.sparkContext.broadcast(linksById)
    val rows = cands.select(col(tripCol).cast("string").as("trip"),
        col(ptCol).cast("long").as("pt"), col(tsCol).cast("double").as("ts"),
        col("link_id"), col("offset_ratio").cast("double"),
        col("cand_dist").cast("double"), col("cand_rank"))
      .as[(String, Long, Double, Long, Double, Double, Int)]
    rows.groupByKey(_._1).flatMapGroups { (trip, it) =>
      val skimM = bcSkim.value
      val linkM = bcLinks.value
      val pts = assemblePts(it)
      val nObs = pts.length
      if (nObs < 2) Iterator.empty
      else {
        val (emit, trans) = costFns(pts, skimM, linkM)
        val path = Viterbi.decodeVar(nObs, t => pts(t)._3.length,
          emit, trans)
        (1 until nObs).iterator.map { i =>
          val a = pts(i - 1)._3(path(i - 1)); val b = pts(i)._3(path(i))
          if (a.linkId == b.linkId) {
            val endR = math.max(a.offsetRatio, b.offsetRatio)
            Leg(trip, i, pts(i - 1)._2, pts(i)._2, Vector(a.linkId),
              a.offsetRatio, endR, moved = endR != a.offsetRatio)
          } else skimM.get((a.linkId, b.linkId)) match {
            case Some((_, links)) =>
              Leg(trip, i, pts(i - 1)._2, pts(i)._2, links,
                a.offsetRatio, b.offsetRatio, moved = true)
            case None =>
              // no finite path between ANY candidate pair at this step
              // (Viterbi ties resolved to index 0 over all-infinite
              // costs): the reference's path==None `continue` — emit an
              // unmoved leg so allocation skips it rather than crashing
              // the stage (TaxiDataHelper.py:425-427)
              Leg(trip, i, pts(i - 1)._2, pts(i)._2, Vector(a.linkId),
                a.offsetRatio, a.offsetRatio, moved = false)
          }
        }
      }
    }
  }

  /** G4+ — the optional smoother output beside the decode: per candidate
    * state the forward-backward posterior probability
    * P(state | all trip observations), over the SAME cost structure the
    * decode minimizes (Trajectory.py:220-235's calculateProbabilities
    * runs TrajectorySmoother1 on the identical features/transitions).
    * Distributed the same way as viterbiLegs: one kernel call per trip.
    * Returns (trip, pt, link_id, offset_ratio, cand_dist, prob); a point
    * whose states are all unreachable carries prob 0 rows. */
  def viterbiPosteriors(
      cands: DataFrame, tripCol: String, ptCol: String, tsCol: String,
      skim: Map[(Long, Long), (Double, Vector[Long])],
      linksById: Map[Long, Link]): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val bcSkim = spark.sparkContext.broadcast(skim)
    val bcLinks = spark.sparkContext.broadcast(linksById)
    val rows = cands.select(col(tripCol).cast("string").as("trip"),
        col(ptCol).cast("long").as("pt"), col(tsCol).cast("double").as("ts"),
        col("link_id"), col("offset_ratio").cast("double"),
        col("cand_dist").cast("double"), col("cand_rank"))
      .as[(String, Long, Double, Long, Double, Double, Int)]
    rows.groupByKey(_._1).flatMapGroups { (trip, it) =>
      val pts = assemblePts(it)
      val nObs = pts.length
      if (nObs == 0) Iterator.empty
      else {
        val (emit, trans) = costFns(pts, bcSkim.value, bcLinks.value)
        val gamma = Viterbi.smooth(nObs, t => pts(t)._3.length, emit, trans)
        pts.iterator.zipWithIndex.flatMap { case ((pt, _, states), t) =>
          states.iterator.zipWithIndex.map { case (st, s) =>
            (trip, pt, st.linkId, st.offsetRatio, st.dist, gamma(t)(s))
          }
        }
      }
    }.toDF("trip", "pt", "link_id", "offset_ratio", "cand_dist", "prob")
  }

  /** G5 — observed travel time allocated to the links of each matched leg
    * proportional to partial free-flow time (equal split when effectively
    * stationary, HwyNetwork.py:569-610), then the consecutive-link merge
    * and cumulative start times (TaxiDataHelper.py:440-485) — windows over
    * (trip, leg, pos), no kernel. Returns one row per merged traversal:
    * (trip, link_id, traversal_ratio, travel_time, start_ts).
    */
  def allocateTravelTimes(legs: Dataset[Leg], links: Seq[Link]): DataFrame = {
    val spark = legs.sparkSession
    import spark.implicits._
    val ffDf = links.map(l => (l.linkId, l.ffSec)).toDF("link_id", "ff_sec")
    val exploded = legs.where(col("moved"))
      .select(col("trip"), col("leg"), col("tStart"), col("tEnd"),
        col("startRatio"), col("endRatio"),
        posexplode(col("links")).as(Seq("pos", "link_id")),
        size(col("links")).as("n_links"))
      .join(broadcast(ffDf), "link_id")
    // traversal ratio: 1, minus the untraversed head of the first link and
    // tail of the last (both on the same element for single-link paths)
    val ratio = lit(1.0) -
      when(col("pos") === 0, col("startRatio")).otherwise(0.0) -
      when(col("pos") === col("n_links") - 1, lit(1.0) - col("endRatio"))
        .otherwise(0.0)
    val wLeg = Window.partitionBy("trip", "leg")
    val alloc = exploded
      .withColumn("ratio", ratio)
      .withColumn("ff_part", col("ratio") * col("ff_sec"))
      .withColumn("tot_ff", sum("ff_part").over(wLeg))
      .withColumn("tt",
        when(col("tot_ff") < 0.1,
          (col("tEnd") - col("tStart")) / col("n_links"))
          .otherwise((col("tEnd") - col("tStart")) * col("ff_part") / col("tot_ff")))
    // consecutive-link merge: a new run starts whenever the link changes
    // along the (leg, pos) order; runs then collapse to one row each
    val wOrd = Window.partitionBy("trip").orderBy("leg", "pos")
    val runs = alloc
      .withColumn("chg",
        (lag("link_id", 1).over(wOrd).isNull ||
          col("link_id") =!= lag("link_id", 1).over(wOrd)).cast("int"))
      .withColumn("run", sum("chg").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("trip_t0", min("tStart").over(Window.partitionBy("trip")))
      .groupBy("trip", "run", "link_id")
      .agg(sum("ratio").as("traversal_ratio"), sum("tt").as("travel_time"),
        min("trip_t0").as("trip_t0"))
    // start times: the trip's first path start plus the running tt sum of
    // the preceding merged traversals (TaxiDataHelper.py:476-485)
    val wRun = Window.partitionBy("trip").orderBy("run")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs
      .withColumn("start_ts",
        to_timestamp(col("trip_t0") + sum("travel_time").over(wRun) -
          col("travel_time")))
      .select(col("trip"), col("run"), col("link_id"),
        col("traversal_ratio"), col("travel_time"), col("start_ts"))
  }

  /** A10 — link travel-time stats: mostly-traversed observations only
    * (ratio > 0.75), times scaled back to the full link, grouped by link
    * and hour (TaxiDataHelper.py:489-541: count / mean / std / p95; np.std
    * is population std). */
  def linkStats(traversals: DataFrame): DataFrame =
    traversals
      .where(col("traversal_ratio") > 0.75)
      .withColumn("full_tt", col("travel_time") / col("traversal_ratio"))
      .withColumn("hour", hour(col("start_ts")))
      .groupBy("link_id", "hour")
      .agg(count(lit(1)).as("observations"),
        avg("full_tt").as("tt_mean"),
        coalesce(stddev_pop(col("full_tt")), lit(0.0)).as("tt_std"),
        expr("percentile(full_tt, 0.95)").as("tt_95"))
}
