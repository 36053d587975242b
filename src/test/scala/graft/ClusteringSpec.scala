package graft

import graft.operators.Clustering

/** Distributed Lloyd k-means must reproduce a sequential reference fold
  * of the same deterministic recurrence (min-id init, 6-dp-rounded
  * argmin with id tie-break, 6-dp-rounded means), and converge to the
  * obvious clustering on well-separated data.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Sequential replay of the exact recurrence kmeansAssign runs. */
  private def sequentialKmeans(
      pts: Seq[(Long, Seq[Double])], k: Int, iters: Int): Map[Long, Long] = {
    var cents: IndexedSeq[Seq[Double]] =
      pts.sortBy(_._1).take(k).map(_._2).toIndexedSeq
    def assign(v: Seq[Double]): Int =
      cents.zipWithIndex.map { case (c, cid) =>
        (round6(v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum), cid)
      }.min._2
    for (_ <- 1 to iters) {
      val groups = pts.groupBy(p => assign(p._2))
      cents = (0 until k).map { cid =>
        groups.get(cid) match {
          case Some(members) =>
            val dims = members.head._2.length
            (0 until dims).map { i =>
              // mirror the engine exactly: each component rounds to
              // decimal(28,12) before the exact sum, then one rounding
              // at the mean
              val s = members.map(p => BigDecimal(p._2(i))
                .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
              round6((s.toDouble / members.size))
            }
          case None => cents(cid)
        }
      }
    }
    pts.map(p => p._1 -> assign(p._2).toLong).toMap
  }

  private val rnd = new scala.util.Random(7)
  private def jitter(base: Seq[Double]): Seq[Double] =
    base.map(_ + rnd.nextDouble() * 0.1)

  test("matches the sequential reference recurrence") {
    val bases = Seq(Seq(0.0, 0.0, 0.0), Seq(5.0, 5.0, 0.0), Seq(0.0, 9.0, 9.0))
    val pts = (0L until 90L).map(i => i -> jitter(bases((i % 3).toInt)))
    val want = sequentialKmeans(pts, k = 3, iters = 2)
    val got = Clustering.kmeansAssign(
        pts.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 3, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("well-separated blobs land in distinct clusters") {
    val bases = Seq(Seq(0.0, 0.0), Seq(100.0, 0.0), Seq(0.0, 100.0))
    val pts = (0L until 60L).map(i => i -> jitter(bases((i % 3).toInt)))
    val got = Clustering.kmeansAssign(
        pts.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 3, iters = 2)
      .as[(Long, Long)].collect().toMap
    // every blob maps to exactly one cluster id and clusters don't mix
    val byBase = pts.groupBy(_._1 % 3).map { case (b, ps) =>
      b -> ps.map(p => got(p._1)).toSet
    }
    assert(byBase.values.forall(_.size == 1))
    assert(byBase.values.flatten.toSet.size == 3)
  }

  test("semDeDup drops higher-id near-dups within a cluster only") {
    // two far-apart blobs; inside blob 0 plant an exact duplicate pair
    // (2, 12) and a near-orthogonal pair that must survive
    val pts: Seq[(Long, Seq[Double])] = Seq(
      0L -> Seq(1.0, 0.0), 2L -> Seq(0.8, 0.6), 12L -> Seq(0.8, 0.6),
      1L -> Seq(-50.0, -50.0), 11L -> Seq(-50.0, -50.1))
    val got = Clustering.semDeDup(
        pts.toDF("vec_id", "embedding"), "vec_id", "embedding",
        k = 2, iters = 2, threshold = 0.95)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // duplicates keep the lowest id of the pair
    assert(got(2L)._2 && !got(12L)._2)
    assert(got(1L)._2 && !got(11L)._2)
    // 0 is in the dup blob's cluster but under threshold vs (2, 12)?
    // cos((1,0),(0.8,0.6)) = 0.8 < 0.95 -> kept
    assert(got(0L)._2)
    // cross-cluster near-identical directions never compare: (1,0) vs
    // (-50,-50) are in different clusters by construction
    assert(got.values.map(_._1).toSet.size == 2)
  }

  test("semDeDupPq with an exact codebook matches semDeDup") {
    // when every distinct vector is its own codeword, decode is the
    // identity and the PQ-coded compare must reproduce the exact
    // operator bit-for-bit — isolates the codes/decode plumbing from
    // the approximation error a trained codebook introduces
    import graft.operators.Quantization
    val pts: Seq[(Long, Seq[Double])] = Seq(
      0L -> Seq(1.0, 0.0, 1.0, 0.0),
      1L -> Seq(0.96, 0.28, 0.96, 0.28), // cos vs id 0 = 0.96 -> dup
      2L -> Seq(0.0, 1.0, 0.0, 1.0),
      3L -> Seq(-50.0, -50.0, -50.0, -50.0))
    val df = pts.toDF("vec_id", "embedding")
    val cb = Quantization.initCodebook(df, "vec_id", "embedding", 4)
    val exact = Clustering.semDeDup(df, "vec_id", "embedding",
        k = 2, iters = 2, threshold = 0.9)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val pq = Clustering.semDeDupPq(df, "vec_id", "embedding",
        k = 2, iters = 2, codebook = cb, m = 2, dims = 4, threshold = 0.9)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(pq == exact)
    // and the dup actually dropped (the test isn't vacuous)
    assert(pq.exists { case (_, _, kept) => !kept })
  }

  test("empty cluster keeps its previous centroid") {
    // k=3 but only two real blobs and the 3rd-smallest id sits inside
    // blob 0 -> its cluster empties after round 1 and must not crash
    val pts: Seq[(Long, Seq[Double])] =
      Seq(0L -> Seq(0.0, 0.0), 1L -> Seq(50.0, 50.0), 2L -> Seq(0.1, 0.1)) ++
        (3L until 30L).map(i => i -> jitter(Seq(if (i % 2 == 0) 0.0 else 50.0,
          if (i % 2 == 0) 0.0 else 50.0)))
    val want = sequentialKmeans(pts, k = 3, iters = 2)
    val got = Clustering.kmeansAssign(
        pts.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 3, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("converged stop matches the fixed-round twin at its own k and the shift trace") {
    val bases = Seq(Seq(0.0, 0.0, 0.0), Seq(5.0, 5.0, 0.0), Seq(0.0, 9.0, 9.0))
    val pts = (0L until 120L).map(i => i -> jitter(bases((i % 3).toInt)))
    val df = pts.toDF("vec_id", "embedding")
    val tol = 0.01
    val conv = Clustering.kmeansAssignConverged(
        df, "vec_id", "embedding", k = 3, tol = tol, maxIter = 15)
      .as[(Long, Long, Int, Double)].collect()
    val iters = conv.head._3
    val shift = conv.head._4
    assert(conv.forall(r => r._3 == iters && r._4 == shift),
      "iters/shift must be constant across rows")
    assert(shift < tol, s"stopped with shift=$shift >= tol")
    assert(iters < 15, "hit maxIter instead of converging")
    // the stop fired exactly where the shift trace first drops below tol
    val trace = Clustering.kmeansShiftTrace(
      df, "vec_id", "embedding", k = 3, maxIter = 15)
    assert(trace.indexWhere(_ < tol) + 1 == iters,
      s"stop at $iters but trace=${trace.mkString(",")}")
    assert(trace(iters - 1) == shift, "reported shift must be the stop round's")
    // and the assignment equals the fixed-round recurrence at the same k
    val fixed = Clustering.kmeansAssign(
        df, "vec_id", "embedding", k = 3, iters = iters)
      .as[(Long, Long)].collect().toMap
    assert(conv.map(r => r._1 -> r._2).toMap == fixed,
      "converged assignment diverges from the fixed-round twin at the same k")
  }

  test("kCenterGreedy: hand-solved farthest-point picks with id tie-break") {
    // seed = min id (1). round 1: farthest is 2 (d=100). round 2: both 3
    // and 4 sit at min-dist 1 -> tie breaks to the smaller id 3.
    val df = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(10.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(9.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val picks = Clustering.kCenterGreedy(df, "vec_id", "embedding", k = 3)
      .orderBy("round")
      .select("round", "center_id", "radius")
      .as[(Long, Long, Option[Double])].collect()
    assert(picks.toSeq == Seq((0L, 1L, None), (1L, 2L, Some(100.0)),
      (2L, 3L, Some(1.0))))
    // assignment: 4 joins center 2's cluster (d=1 vs 81/82); coverage of
    // that cluster is exactly that distance
    val audit = Clustering.kCenterAssign(df, "vec_id", "embedding",
        Clustering.kCenterGreedy(df, "vec_id", "embedding", k = 3))
      .orderBy("round")
      .select("round", "n_assigned", "coverage")
      .as[(Long, Long, Double)].collect()
    assert(audit.toSeq == Seq((0L, 1L, 0.0), (1L, 2L, 1.0), (2L, 1L, 0.0)))
  }

  test("kCenterGreedy: selection radii are non-increasing (cover property)") {
    val rnd = new scala.util.Random(7)
    val df = (1L to 60L).map(i =>
      (i, Array.fill(4)(rnd.nextFloat() * 10))).toDF("vec_id", "embedding")
    val radii = Clustering.kCenterGreedy(df, "vec_id", "embedding", k = 6)
      .orderBy("round").select("radius")
      .as[Option[Double]].collect().flatten
    assert(radii.length == 5)
    radii.toSeq.sliding(2).foreach { w =>
      assert(w(1) <= w(0), s"radius grew: ${w(0)} -> ${w(1)}") }
  }
}
