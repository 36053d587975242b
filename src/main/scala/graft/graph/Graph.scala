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
  *  - `bfsHops`: distributed iterative frontier expansion over an edge
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

  /** All-pairs minimum hop counts by iterative frontier joins (directed
    * edges). Each iteration is one join + union + min-aggregate; AQE
    * handles the shrinking frontier. Converges in diameter iterations.
    */
  def bfsHops(edges: DataFrame, maxHops: Int): DataFrame = {
    // edges: (src, dst)
    var known = edges.select(col("src"), col("dst"), lit(1L).as("hops"))
      .groupBy("src", "dst").agg(min("hops").as("hops"))
      .cache()
    var frontier = known
    var i = 1
    var done = false
    while (i < maxHops && !done) {
      val expanded = frontier.alias("f")
        .join(edges.alias("e"), col("f.dst") === col("e.src"))
        .select(col("f.src").as("src"), col("e.dst").as("dst"),
          (col("f.hops") + 1).as("hops"))
      val newPairs = expanded.join(known, Seq("src", "dst"), "left_anti")
        .groupBy("src", "dst").agg(min("hops").as("hops"))
        .cache()
      // count() both materializes the cache and answers the emptiness
      // check — isEmpty would be a separate job per iteration
      if (newPairs.count() == 0) { newPairs.unpersist(); done = true }
      else {
        val prevKnown = known
        val prevFrontier = frontier
        // newPairs is left_anti-disjoint from known and already min'd
        // within itself, so the union IS the new min state — re-aggregating
        // here would shuffle the whole known set (the largest frame, O(V^2)
        // pairs) once per iteration for nothing
        known = known.unionByName(newPairs).cache()
        known.count() // materialize before releasing the lineage inputs
        prevKnown.unpersist()
        if (prevFrontier ne prevKnown) prevFrontier.unpersist()
        frontier = newPairs
      }
      i += 1
    }
    if (frontier ne known) frontier.unpersist() // last frontier is spent
    known
  }
}
