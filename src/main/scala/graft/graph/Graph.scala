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

  /** Lineage cut for iterative state. `durable = false` →
    * `localCheckpoint()`: blocks pinned in executor memory — fastest on a
    * single box, but NOT fault-tolerant (a lost executor loses the blocks
    * and kills the whole multi-round job). `durable = true` → reliable
    * `checkpoint()` against the SparkContext checkpoint directory: each
    * round's state is written to the (distributed) filesystem, so a lost
    * executor re-reads instead of recomputing 40 rounds of lineage — the
    * right trade for a long iterative job on a real cluster, at the cost
    * of one state write per round. Both paths cut lineage eagerly (one
    * job per round, no geometric plan growth) and produce bit-identical
    * state ([[GraphClusterPlanSpec]] pins the hash parity). */
  private def cut(df: DataFrame, durable: Boolean): DataFrame =
    if (durable) df.checkpoint() else df.localCheckpoint()

  /** Route a caller-supplied checkpoint dir to the context; returns
    * whether the durable path is active. Set once per operator call, not
    * per round (setCheckpointDir creates a fresh UUID subdir each time). */
  private def durableDir(df: DataFrame, dir: Option[String]): Boolean = {
    dir.foreach(df.sparkSession.sparkContext.setCheckpointDir)
    dir.isDefined
  }

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
               damping: Double = 0.85, teleport: Double = 0.15,
               checkpointDir: Option[String] = None,
               edgesPrepared: Boolean = false): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")
    val durable = durableDir(edges, checkpointDir)
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
    // edge table on src (one-time layout, zero per-round edge movement).
    // That path is `edgesPrepared = true`: the caller passes an
    // already-DEDUPED (src, dst) frame — typically `spark.table` over a
    // [[graft.sources.Sinks.writeBucketed]] table bucketed by src — and
    // this code must NOT re-distinct or checkpoint it, either of which
    // would destroy the scan's bucketed output partitioning and
    // reintroduce the per-round edge exchange. GraphClusterPlanSpec locks
    // the zero-edge-side-exchange plan and the hash parity of both paths;
    // q179 runs the bucketed variant under the driver's oracle gate.
    val e =
      if (edgesPrepared) edges.select(col("src"), col("dst"))
      else cut(edges.select(col("src"), col("dst")).distinct(), durable)
    var state = cut(prInit(e), durable)
    var it = 0
    while (it < iterations) {
      state = cut(prRound(state, e, damping, teleport), durable)
      it += 1
    }
    state.select(col("node"), col("rank"))
  }

  /** PageRank state init: (node, outdeg, n, rank=1/n). Package-private so
    * the plan canary can inspect a single round against a bucketed edge
    * table without the post-checkpoint plan truncation hiding it. */
  private[graft] def prInit(e: DataFrame): DataFrame = {
    import graft.operators.Guards
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    // (node, outdeg) with outdeg null for sinks; N broadcast on constKey
    val meta = nodes.agg(count(lit(1)).as("n"))
      .withColumn("__k", Guards.constKey(col("n")))
    nodes.join(outdeg, Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(meta), "__k")
      .select(col("node"), col("outdeg"), col("n"),
        round(lit(1.0) / col("n"), 12).as("rank"))
  }

  /** One PageRank round over (node, outdeg, n, rank) state — the plan a
    * cluster pays `iterations` times: one state⋈edges join on src (edge
    * side exchange-free when e is bucketed by src), one dst aggregation,
    * two one-row constKey broadcasts. */
  private[graft] def prRound(state: DataFrame, e: DataFrame,
                             damping: Double, teleport: Double): DataFrame = {
    import graft.operators.Guards
    val exactSum12 = (c: Column) =>
      sum(round(c, 12).cast("decimal(28,12)")).cast("double")
    val contribs = state.where(col("outdeg").isNotNull)
      .join(e, state("node") === e("src"))
      .groupBy(col("dst").as("node"))
      .agg(exactSum12(col("rank") / col("outdeg")).as("in_sum"))
    val dangling = state
      .agg(coalesce(exactSum12(when(col("outdeg").isNull, col("rank"))),
        lit(0.0)).as("mass"))
      .withColumn("__k", Guards.constKey(col("mass")))
    // carry pageRankConverged's __prev column through, if present
    val carry = state.columns.filter(_ == "__prev").toSeq.map(col)
    state.drop("rank")
      .join(contribs, Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(dangling), "__k")
      .select(Seq(col("node"), col("outdeg"), col("n")) ++ carry :+
        round(lit(teleport) / col("n") +
          lit(damping) * (coalesce(col("in_sum"), lit(0.0)) +
            col("mass") / col("n")), 12).as("rank"): _*)
  }

  /** [[pageRank]] with a convergence stop instead of a fixed round count:
    * iterate until the L1 delta Σ|rank_k − rank_{k−1}| falls below `tol`
    * (or `maxIter` rounds), returning (node, rank, iters, l1_delta) so
    * callers can see what the stop actually was. This is the production
    * contract (PageRank's power iteration contracts at rate ~damping per
    * round, so tol=1e-9 lands in ~tens of rounds regardless of graph
    * size); the fixed-round [[pageRank]] stays the bit-exact oracle twin
    * (an unrolled SQL oracle cannot express a data-dependent stop —
    * q182 rides the driver's rows-only check instead). The delta is one
    * extra one-row aggregate per round — a driver-side action, same cost
    * class as the eager checkpoint that already runs each round. */
  def pageRankConverged(edges: DataFrame, tol: Double, maxIter: Int = 50,
                        damping: Double = 0.85, teleport: Double = 0.15,
                        checkpointDir: Option[String] = None,
                        edgesPrepared: Boolean = false): DataFrame = {
    require(tol > 0 && maxIter >= 1, "need tol > 0 and maxIter >= 1")
    val durable = durableDir(edges, checkpointDir)
    val e =
      if (edgesPrepared) edges.select(col("src"), col("dst"))
      else cut(edges.select(col("src"), col("dst")).distinct(), durable)
    var state = cut(prInit(e), durable)
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIter && delta >= tol) {
      // same round plan as prRound, plus the old rank carried through as
      // __prev — delta tracking costs ONE one-row aggregate over the
      // already-checkpointed state per round, not an extra shuffle join
      val next = cut(
        prRound(state.withColumn("__prev", col("rank")), e, damping, teleport),
        durable)
      delta = next
        .agg(sum(abs(col("rank") - col("__prev")).cast("decimal(28,12)"))
          .cast("double"))
        .head().getDouble(0)
      state = next
      it += 1
    }
    state.select(col("node"), col("rank"),
      lit(it).as("iters"), round(lit(delta), 12).as("l1_delta"))
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
  def hits(edges: DataFrame, iterations: Int = 4,
           checkpointDir: Option[String] = None,
           edgesPrepared: Boolean = false,
           edgesByDst: Option[DataFrame] = None): DataFrame = {
    import graft.operators.Guards
    require(iterations >= 1, "hits needs at least one iteration")
    val durable = durableDir(edges, checkpointDir)
    // HITS joins edges on src (auth half-step) AND on dst (hub
    // half-step), so the cluster layout that zeroes per-round edge
    // movement is TWO one-time bucketed copies of the same deduped edge
    // set: `edges` bucketed by src and `edgesByDst` bucketed by dst
    // (pass both with edgesPrepared = true). One copy alone still halves
    // the per-round edge traffic. GraphClusterPlanSpec locks both
    // half-step plans edge-exchange-free and the hash parity vs the
    // default path.
    val e =
      if (edgesPrepared) edges.select(col("src"), col("dst"))
      else cut(edges.select(col("src"), col("dst")).distinct(), durable)
    val eDst = edgesByDst.map(_.select(col("src"), col("dst"))).getOrElse(e)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val meta = nodes.agg(count(lit(1)).as("n"))
      .withColumn("__k", Guards.constKey(col("n")))
    var state = cut(nodes
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(meta), "__k")
      .select(col("node"), round(lit(1.0) / col("n"), 12).as("hub"),
        round(lit(1.0) / col("n"), 12).as("auth")), durable)
    var it = 0
    while (it < iterations) {
      val afterAuth = cut(hitsAuthStep(state, e), durable)
      state = cut(hitsHubStep(afterAuth, eDst), durable)
      it += 1
    }
    state
  }

  private def exactSum12Col(c: Column): Column =
    sum(round(c, 12).cast("decimal(28,12)")).cast("double")

  /** HITS authority half-step: join state to edges on src, aggregate hub
    * mass by dst, L1-normalize. Edge side is exchange-free when e is
    * bucketed by src. */
  private[graft] def hitsAuthStep(state: DataFrame, e: DataFrame): DataFrame = {
    import graft.operators.Guards
    val aRaw = state.join(e, state("node") === e("src"))
      .groupBy(col("dst").as("node"))
      .agg(exactSum12Col(col("hub")).as("raw"))
    val aTot = aRaw.agg(exactSum12Col(col("raw")).as("tot"))
      .withColumn("__k", Guards.constKey(col("tot")))
    state.drop("auth")
      .join(aRaw, Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(aTot), "__k")
      .select(col("node"), col("hub"),
        round(coalesce(col("raw"), lit(0.0)) / col("tot"), 12).as("auth"))
  }

  /** HITS hub half-step (mirror of [[hitsAuthStep]] on dst): edge side is
    * exchange-free when eDst is bucketed by dst. */
  private[graft] def hitsHubStep(state: DataFrame, eDst: DataFrame): DataFrame = {
    import graft.operators.Guards
    val hRaw = state.join(eDst, state("node") === eDst("dst"))
      .groupBy(col("src").as("node"))
      .agg(exactSum12Col(col("auth")).as("raw"))
    val hTot = hRaw.agg(exactSum12Col(col("raw")).as("tot"))
      .withColumn("__k", Guards.constKey(col("tot")))
    state.drop("hub")
      .join(hRaw, Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(hTot), "__k")
      .select(col("node"),
        round(coalesce(col("raw"), lit(0.0)) / col("tot"), 12).as("hub"),
        col("auth"))
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
  def bfsHops(edges: DataFrame, maxHops: Int,
              checkpointDir: Option[String] = None): DataFrame = {
    // edges: (src, dst)
    val durable = durableDir(edges, checkpointDir)
    var known = cut(edges.select(col("src"), col("dst"), lit(1L).as("hops"))
      .groupBy("src", "dst").agg(min("hops").as("hops")), durable)
    var reach = 1L
    while (reach < maxHops) {
      val doubled = known.alias("a")
        .join(known.alias("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"),
          (col("a.hops") + col("b.hops")).as("hops"))
      known = cut(known.unionByName(doubled)
        .groupBy("src", "dst").agg(min("hops").as("hops"))
        .where(col("hops") <= maxHops), durable)
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
                           teleport: Double = 0.15,
                           checkpointDir: Option[String] = None,
                           edgesPrepared: Boolean = false): DataFrame = {
    import graft.operators.Guards
    require(iterations >= 1, "personalizedPageRank needs at least one iteration")
    val durable = durableDir(edges, checkpointDir)
    val e =
      if (edgesPrepared) edges.select(col("src"), col("dst"))
      else cut(edges.select(col("src"), col("dst")).distinct(), durable)
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
    state = cut(state, durable)
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
      state = cut(state.drop("rank")
        .join(contribs, Seq("node"), "left")
        .withColumn("__k", Guards.constKey(col("node")))
        .join(broadcast(dangling), "__k")
        .select(col("node"), col("outdeg"), col("p"),
          round(lit(teleport) * col("p") +
            lit(damping) * (coalesce(col("in_sum"), lit(0.0)) +
              col("mass") * col("p")), 12).as("rank")), durable)
      it += 1
    }
    state.select(col("node"), col("rank"))
  }
}
