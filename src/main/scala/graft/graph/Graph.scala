package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Distributed PageRank with damping and dangling-mass redistribution —
    * the web-graph importance ranker crawl-curation pipelines run over
    * domain/link graphs (Page et al. 1999; Common Crawl publishes exactly
    * this family of host-level rank).
    *
    * Plan shape per iteration (the standard Pregel decomposition, kept
    * relational so Catalyst plans it):
    *  - state is one frame (node, outdeg, rank); edges are joined on
    *    node = src and contributions aggregated by dst — the only two
    *    data-proportional shuffles, both on the node key, so at scale a
    *    bucketing of both sides by node makes every round co-partitioned;
    *  - the dangling mass (rank parked on sink nodes) and the node count
    *    are ONE-row aggregates broadcast back on a non-foldable constant
    *    key ([[graft.operators.Guards.constKey]] — the plan-canary
    *    contract for one-row joins);
    *  - `localCheckpoint` cuts lineage each round (the [[bfsHops]]
    *    lesson: no geometric plan growth, one job per round).
    *
    * Cross-engine float determinism (the kmeans decimal-sum discipline):
    * every cross-row reduction — contribution sums and the dangling mass —
    * rounds its addends to 12 dp and sums EXACT decimal(28,12); scalar
    * per-row arithmetic is identical IEEE on both engines; each new rank
    * is re-rounded to 12 dp, so iteration K's state is bit-identical to
    * the oracle's unrolled CTE chain.
    *
    * Returns (node, rank) with rank rounded to 12 dp summing to ~1.
    *
    * `teleport` is passed as its own literal rather than computed as
    * `1.0 - damping`: the Scala subtraction yields 0.15000000000000002
    * while a SQL oracle's `0.15` literal parses to the nearest double
    * below — the two constants must be PARSED identically on both
    * engines, not derived.
    */
  def pageRank(edges: DataFrame, iterations: Int = 8,
               damping: Double = 0.85, teleport: Double = 0.15): DataFrame = {
    import graft.operators.Guards
    require(iterations >= 1, "pageRank needs at least one iteration")
    // The contributions join hits `e` on src every round. Two ways to pay
    // for that, A/B-measured at sf0.1 local[32] (r06, per-round times):
    //  - materialized-RDD checkpoint (this code): each round re-shuffles
    //    the compact deduped edge RDD into the join — ~1-2 s/round; the
    //    checkpointed LogicalRDD reports UnknownPartitioning under AQE,
    //    so the exchange is NOT elided, but it moves only ~20 MB of
    //    UnsafeRows already in RAM;
    //  - repartition(src) + persist: the cached InMemoryTableScan DOES
    //    keep hashpartitioning(src) and the plan provably drops the
    //    edge-side exchange (and outdeg's), yet rounds run 2-10x SLOWER
    //    (2.5-22 s): per-round columnar-cache decompression costs more
    //    than the small shuffle it saves at this scale.
    // So: checkpoint locally. On a real cluster, where the per-round
    // shuffle is network-bound and the cache is distributed, the
    // co-location win flips the trade — the cluster answer is a bucketed
    // edge table on src (one-time layout, zero per-round edge movement),
    // not a runtime persist.
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    // (node, outdeg) with outdeg null for sinks; N broadcast on constKey
    val meta = nodes.agg(count(lit(1)).as("n"))
      .withColumn("__k", Guards.constKey(col("n")))
    var state = nodes.join(outdeg, Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(meta), "__k")
      .select(col("node"), col("outdeg"), col("n"),
        round(lit(1.0) / col("n"), 12).as("rank"))
      .localCheckpoint()
    val exactSum12 = (c: Column) =>
      sum(round(c, 12).cast("decimal(28,12)")).cast("double")
    var it = 0
    while (it < iterations) {
      val contribs = state.where(col("outdeg").isNotNull)
        .join(e, state("node") === e("src"))
        .groupBy(col("dst").as("node"))
        .agg(exactSum12(col("rank") / col("outdeg")).as("in_sum"))
      val dangling = state
        .agg(coalesce(exactSum12(when(col("outdeg").isNull, col("rank"))),
          lit(0.0)).as("mass"))
        .withColumn("__k", Guards.constKey(col("mass")))
      state = state.drop("rank")
        .join(contribs, Seq("node"), "left")
        .withColumn("__k", Guards.constKey(col("node")))
        .join(broadcast(dangling), "__k")
        .select(col("node"), col("outdeg"), col("n"),
          round(lit(teleport) / col("n") +
            lit(damping) * (coalesce(col("in_sum"), lit(0.0)) +
              col("mass") / col("n")), 12).as("rank"))
        .localCheckpoint()
      it += 1
    }
    state.select(col("node"), col("rank"))
  }

  /** HITS hubs and authorities (Kleinberg, JACM 1999) — the
    * query-dependent companion to [[pageRank]]: on a bipartite
    * buyer→supplier (or page→cited-page) graph, hub scores rank the
    * pointers and authority scores rank the pointed-at. Sum (L1)
    * normalization each half-step keeps every operation
    * division-or-sum — no sqrt in the iteration — so the
    * decimal(28,12) round-then-exact-sum regime carries through
    * unchanged and iteration K's state is bit-identical to an
    * unrolled SQL replay.
    *
    * Per iteration: authority half-step (join state to edges on src,
    * aggregate hubs by dst, one-row total broadcast on a non-foldable
    * key, normalize + round 12 dp), then the mirror hub half-step on
    * dst. Two node-keyed shuffle joins + two bounded aggregations per
    * round — the PageRank cost shape exactly, with the same
    * `localCheckpoint` lineage cut per half-step and the same cluster
    * note: bucket both sides by node and every round is co-partitioned.
    */
  def hits(edges: DataFrame, iterations: Int = 4): DataFrame = {
    import graft.operators.Guards
    require(iterations >= 1, "hits needs at least one iteration")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val meta = nodes.agg(count(lit(1)).as("n"))
      .withColumn("__k", Guards.constKey(col("n")))
    val exactSum12 = (c: Column) =>
      sum(round(c, 12).cast("decimal(28,12)")).cast("double")
    var state = nodes
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(meta), "__k")
      .select(col("node"), round(lit(1.0) / col("n"), 12).as("hub"),
        round(lit(1.0) / col("n"), 12).as("auth"))
      .localCheckpoint()
    var it = 0
    while (it < iterations) {
      val aRaw = state.join(e, state("node") === e("src"))
        .groupBy(col("dst").as("node"))
        .agg(exactSum12(col("hub")).as("raw"))
      val aTot = aRaw.agg(exactSum12(col("raw")).as("tot"))
        .withColumn("__k", Guards.constKey(col("tot")))
      val afterAuth = state.drop("auth")
        .join(aRaw, Seq("node"), "left")
        .withColumn("__k", Guards.constKey(col("node")))
        .join(broadcast(aTot), "__k")
        .select(col("node"), col("hub"),
          round(coalesce(col("raw"), lit(0.0)) / col("tot"), 12).as("auth"))
        .localCheckpoint()
      val hRaw = afterAuth.join(e, afterAuth("node") === e("dst"))
        .groupBy(col("src").as("node"))
        .agg(exactSum12(col("auth")).as("raw"))
      val hTot = hRaw.agg(exactSum12(col("raw")).as("tot"))
        .withColumn("__k", Guards.constKey(col("tot")))
      state = afterAuth.drop("hub")
        .join(hRaw, Seq("node"), "left")
        .withColumn("__k", Guards.constKey(col("node")))
        .join(broadcast(hTot), "__k")
        .select(col("node"),
          round(coalesce(col("raw"), lit(0.0)) / col("tot"), 12).as("hub"),
          col("auth"))
        .localCheckpoint()
      it += 1
    }
    state
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

  /** Personalized PageRank (Page et al. 1999 §6; the topic-sensitive /
    * seed-proximity variant): the teleport vector concentrates on a
    * SOURCE SET instead of all nodes — p(v) = 1/|S| for v ∈ S, else 0 —
    * and dangling mass returns to the sources, so rank measures
    * proximity to the seeds ("suppliers these customers are closest
    * to"), not global importance. Same Pregel decomposition, shuffle
    * budget, decimal(28,12) round-then-exact-sum regime, and
    * per-round `localCheckpoint` discipline as [[pageRank]]; the
    * personalization vector rides the state frame as one extra rounded
    * column, so each round stays one edge join + one dst aggregation +
    * two one-row broadcasts.
    *
    * `isSource` must be an engine-portable predicate over the node id
    * (the oracle evaluates the identical expression). Returns
    * (node, rank), rank rounded to 12 dp.
    */
  def personalizedPageRank(edges: DataFrame, isSource: Column => Column,
                           iterations: Int, damping: Double = 0.85,
                           teleport: Double = 0.15): DataFrame = {
    import graft.operators.Guards
    require(iterations >= 1, "personalizedPageRank needs at least one iteration")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val meta = nodes.where(isSource(col("node")))
      .agg(count(lit(1)).as("ns"))
      .withColumn("__k", Guards.constKey(col("ns")))
    val exactSum12 = (c: Column) =>
      sum(round(c, 12).cast("decimal(28,12)")).cast("double")
    var state = nodes.join(outdeg, Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(meta), "__k")
      .select(col("node"), col("outdeg"),
        round(when(isSource(col("node")),
          lit(1.0) / col("ns")).otherwise(lit(0.0)), 12).as("p"))
      .withColumn("rank", col("p"))
      .localCheckpoint()
    require(state.where(col("p") > 0).limit(1).count() == 1L,
      "personalizedPageRank: the source predicate matched no node")
    var it = 0
    while (it < iterations) {
      val contribs = state.where(col("outdeg").isNotNull)
        .join(e, state("node") === e("src"))
        .groupBy(col("dst").as("node"))
        .agg(exactSum12(col("rank") / col("outdeg")).as("in_sum"))
      val dangling = state
        .agg(coalesce(exactSum12(when(col("outdeg").isNull, col("rank"))),
          lit(0.0)).as("mass"))
        .withColumn("__k", Guards.constKey(col("mass")))
      state = state.drop("rank")
        .join(contribs, Seq("node"), "left")
        .withColumn("__k", Guards.constKey(col("node")))
        .join(broadcast(dangling), "__k")
        .select(col("node"), col("outdeg"), col("p"),
          round(lit(teleport) * col("p") +
            lit(damping) * (coalesce(col("in_sum"), lit(0.0)) +
              col("mass") * col("p")), 12).as("rank"))
        .localCheckpoint()
      it += 1
    }
    state.select(col("node"), col("rank"))
  }
}
