package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G2 — shortest paths.
  *
  * The reference precomputes a dense all-pairs link-to-link cost matrix on
  * the driver with scipy (HwyNetwork.py:227-294) — valid for its ~10^3-link
  * network. This module offers both regimes:
  *  - `floydWarshall`: plain-Scala dense APSP for small graphs, meant to be
  *    `broadcast` and probed inside expressions/mapGroups (the reference's
  *    pattern, G3);
  *  - `bfsHops`: min-plus pointer doubling over an edge
  *    DataFrame — the plan that still works when the graph itself is big.
  */
object Graph {

  /** Dense APSP with predecessor matrix. Infinity = Double.MaxValue/4. */
  def floydWarshall(n: Int, edges: Seq[(Int, Int, Double)])
      : (Array[Array[Double]], Array[Array[Int]]) = {
    val INF = Double.MaxValue / 4
    val dist = Array.fill(n, n)(INF)
    val pred = Array.fill(n, n)(-1)
    var i = 0
    while (i < n) { dist(i)(i) = 0.0; i += 1 }
    edges.foreach { case (u, v, w) =>
      if (w < dist(u)(v)) { dist(u)(v) = w; pred(u)(v) = u }
    }
    var k = 0
    while (k < n) {
      i = 0
      while (i < n) {
        var j = 0
        val dik = dist(i)(k)
        while (j < n) {
          val nd = dik + dist(k)(j)
          if (nd < dist(i)(j)) { dist(i)(j) = nd; pred(i)(j) = pred(k)(j) }
          j += 1
        }
        i += 1
      }
      k += 1
    }
    (dist, pred)
  }

  /** All-pairs minimum hop counts, capped at `maxHops`, by min-plus
    * squaring (pointer doubling): after round i, `known` holds the exact
    * min-hop distance for every pair at distance <= 2^i (a shortest path
    * of length <= 2^i splits into two shortest halves of length
    * <= 2^(i-1), both already known). ceil(log2(maxHops)) rounds total —
    * O(log n) scheduler round-trips instead of O(diameter) — and exactly
    * ONE job per round: the eager `localCheckpoint` both materializes the
    * round and cuts lineage, so there is no per-round cache + count +
    * left-anti job storm and no geometric plan growth.
    *
    * The per-round `hops <= maxHops` filter keeps the state bounded to
    * the pairs the caller asked for (and is what makes the doubling join
    * safe: both sides are already capped).
    */
  def bfsHops(edges: DataFrame, maxHops: Int): DataFrame = {
    // edges: (src, dst)
    var known = edges.select(col("src"), col("dst"), lit(1L).as("hops"))
      .groupBy("src", "dst").agg(min("hops").as("hops"))
      .localCheckpoint()
    var reach = 1L
    while (reach < maxHops) {
      val doubled = known.alias("a")
        .join(known.alias("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"),
          (col("a.hops") + col("b.hops")).as("hops"))
      known = known.unionByName(doubled)
        .groupBy("src", "dst").agg(min("hops").as("hops"))
        .where(col("hops") <= maxHops)
        .localCheckpoint()
      reach *= 2
    }
    known
  }
}
