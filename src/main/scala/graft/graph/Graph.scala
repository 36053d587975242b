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

  /** [[cut]] for ROUND STATE, with durable-path retention: each tracked
    * checkpoint supersedes the one from two rounds back, which is
    * deleted — without this a 40-round durable job accumulates 40 full
    * state copies in the checkpoint dir (r07 advice/verdict item 5). Two
    * are kept because the converged loops hand back the PREVIOUS state
    * when the probe trips. Long-lived checkpoints (the deduped edge set,
    * re-read by every round) use the untracked [[cut]] and are never
    * pruned. */
  private def cut(df: DataFrame, durable: Boolean, ret: Retention)
      : DataFrame = {
    val out = cut(df, durable)
    if (durable) ret.track(out.sparkSession.sparkContext)
    else ret.trackLocal(out.sparkSession.sparkContext)
    out
  }

  /** Per-operator-invocation tracker of superseded durable state
    * checkpoints. `track()` records the newest `rdd-<id>` dir under the
    * context's current checkpoint dir (the one the checkpoint that just
    * materialized wrote — ids are session-monotonic, and the operator's
    * dir is private to this invocation: `setCheckpointDir` mints a fresh
    * UUID subdir per call) and deletes everything it tracked beyond the
    * newest two. Only paths this instance tracked are ever deleted, so
    * edge/init checkpoints and other operators' state are untouchable. */
  private final class Retention {
    private var kept: List[org.apache.hadoop.fs.Path] = Nil // newest first
    private var keptLocal: List[(Int, org.apache.spark.rdd.RDD[_])] = Nil

    /** Local-mode twin of [[track]]: record the newest persisted RDD —
      * the `localCheckpoint` that just materialized; ids are context-
      * monotonic — and unpersist everything THIS instance tracked beyond
      * the newest two. Without it a k-round loop pins k superseded state
      * copies in the block manager until the RDD objects happen to be
      * GC'd — the leaked-blocks pressure the Profile tool's clearCache
      * note measured (q191: 35 s vs 9 s) and the r09-advice auth-half-
      * step leak in hitsConverged. Keep-newest-2 is the same invariant
      * the durable path already enforces by DELETING files, so any plan
      * that re-read older state would already be broken on durable runs;
      * frames that ARE re-read later (edge sets, Brandes level frames)
      * use the untracked [[cut]] and are never unpersisted. */
    def trackLocal(sc: org.apache.spark.SparkContext): Unit = {
      if (sys.env.contains("SPARK_GRAFT_NO_LOCAL_RET")) return
      val newest = sc.getPersistentRDDs.toSeq.sortBy(_._1).lastOption
      newest.filterNot(n => keptLocal.exists(_._1 == n._1)).foreach { n =>
        keptLocal = n :: keptLocal
        keptLocal.drop(2).foreach(_._2.unpersist(false))
        keptLocal = keptLocal.take(2)
      }
    }

    def track(sc: org.apache.spark.SparkContext): Unit =
      sc.getCheckpointDir.foreach { d =>
        val dir = new org.apache.hadoop.fs.Path(d)
        val fs = dir.getFileSystem(sc.hadoopConfiguration)
        if (fs.exists(dir)) {
          val newest = fs.listStatus(dir).toSeq
            .filter(_.getPath.getName.startsWith("rdd-"))
            .sortBy(_.getPath.getName.stripPrefix("rdd-").toLong)
            .lastOption.map(_.getPath)
          newest.filterNot(kept.contains).foreach { p =>
            kept = p :: kept
            kept.drop(2).foreach(old => fs.delete(old, true))
            kept = kept.take(2)
          }
        }
      }
  }

  /** Run `body` with `checkpointDir` routed to the context (when given),
    * restoring the PREVIOUS checkpoint-dir setting afterwards — without
    * this the per-operator override leaks into every later `checkpoint()`
    * user of the session (r07 advice). Restoration writes the raw
    * internal value back (reflection on the bytecode-public
    * `checkpointDir_$eq` setter): re-calling `setCheckpointDir` would
    * mint a fresh UUID subdir instead of the original one. The eager
    * per-round checkpoints have all materialized before `body` returns,
    * so restoring immediately is safe for the returned lazy frame. */
  /** Planning regime per loop (r09, measured both ways at sf0.1 AND at
    * the 10× sf1 probe): with the DEFAULT (checkpointed-RDD) edge path,
    * AQE must stay ON — its runtime small-side broadcast conversion is
    * what keeps each round's state⋈edges and state⋈contribs joins
    * sort-free (forcing static plans quintupled round task time: q182
    * run_ms 85k → 400k, q188 5.5 s → 12.1 s, q199 17 s → 33 s). With a
    * PREPARED bucketed edge table the co-partitioning is statically
    * known — but whether AQE still earns its per-round replan latency
    * depends on VOLUME, so the choice is derived from the edge table's
    * size, not hard-coded (opt guide §2: scale-adaptive, not a constant
    * tuned for one mode). Measured crossover: at ~10 MB of edges
    * (sf0.1) static rounds win big (q232 44 s → 15.9 s, q179 13 s →
    * 4.6 s — AQE is pure latency when every stage is tiny); at ~100 MB
    * (the 10× probe, 5.9 M edges) adaptive wins (q232-composed probe
    * 48.6 s adaptive vs 103.5 s static — coalescing and runtime
    * broadcasts matter again once the per-round stages carry real
    * data). Threshold `spark.graft.iterative.staticMaxBytes` (default
    * 32 MB ≈ 1 MB/bucket at 32 buckets) sits between the two measured
    * points; above it — including any cluster-scale table — rounds
    * plan adaptively. */
  private def withStaticLoop[T](df: DataFrame, prepared: Boolean)
      (body: => T): T = {
    val static = prepared && {
      val cap = BigInt(df.sparkSession.conf
        .get("spark.graft.iterative.staticMaxBytes", (32L << 20).toString))
      try df.queryExecution.optimizedPlan.stats.sizeInBytes <= cap
      catch { case _: Throwable => false }
    }
    if (static)
      graft.operators.IterPlan.withLoopPlanning(df.sparkSession)(body)
    else body
  }

  private def withDurable[T](df: DataFrame, dir: Option[String])
      (body: Boolean => T): T = {
    val sc = df.sparkSession.sparkContext
    if (dir.isEmpty) body(false)
    else {
      val saved = sc.getCheckpointDir
      sc.setCheckpointDir(dir.get)
      try body(true)
      finally {
        val setter = sc.getClass.getMethods
          .find(_.getName == "checkpointDir_$eq")
          .getOrElse(throw new NoSuchMethodException(
            "SparkContext.checkpointDir_$eq"))
        setter.invoke(sc, saved): Unit
      }
    }
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
    withStaticLoop(edges, edgesPrepared) {
    withDurable(edges, checkpointDir) { durable =>
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
    val ret = new Retention
    var state = cut(prInit(e), durable, ret)
    var it = 0
    while (it < iterations) {
      state = cut(prRound(state, e, damping, teleport), durable, ret)
      it += 1
    }
    state.select(col("node"), col("rank"))
    }
    }
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
    * two one-row constKey broadcasts.
    *
    * `trackDelta` serves [[pageRankConverged]]: the input carries a
    * `__prev` column (last round's rank, null on round one) and the
    * dangling one-row aggregate ALSO computes the L1 delta
    * Σ round(|rank − __prev|, 12) of the transition the input state
    * represents — so the delta rides the broadcast that every round
    * already pays, attached to every output row as `__delta`, and the
    * driver's stop check becomes a limit-1 probe of the checkpointed
    * state instead of a full aggregation job per round (r07 verdict
    * item 7: halves per-round driver actions). The output re-carries
    * `__prev := input rank` for the next round's delta. */
  /** SHUFFLE_HASH hints for the node-scale sides of the per-round joins
    * (`spark.graft.iterative.shjHints`, default ON). The planner sees
    * checkpointed-RDD state with unknown (defaultSizeInBytes) stats, so
    * without the hint each round either sort-merges (static planning —
    * the r09-measured 5× task blowup) or AQE re-plans the join at
    * runtime, typically into a per-round BROADCAST whose build (collect
    * to driver + rebroadcast) is pure driver latency paid every round.
    * The hint fixes the STRATEGY at plan time without faking stats:
    * shuffled-hash is the plan these joins get at any volume — node-
    * scale state cannot broadcast at 100 TB, hash-building the state/
    * aggregate side per partition is exactly the regime the r09 session
    * conf (maxShuffledHashJoinLocalMapThreshold=256m) already opted
    * into at runtime — and AQE stays ON for skew splitting and
    * coalescing. LoopLab A/B (same session, stop readouts identical):
    * q182 shape 22.5 → 13.5 s at sf0.1 AND 82.3 → 58.0 s at the 10×
    * probe volume, so the win is volume-robust, unlike the measured
    * fixed-partition-count variants which invert at 10×. Hints never
    * change results — planning only. */
  private def shjHint(df: DataFrame): DataFrame =
    if (df.sparkSession.conf
        .get("spark.graft.iterative.shjHints", "true").toBoolean)
      df.hint("shuffle_hash")
    else df

  private[graft] def prRound(state0: DataFrame, e: DataFrame,
                             damping: Double, teleport: Double,
                             trackDelta: Boolean = false): DataFrame = {
    import graft.operators.Guards
    // the input may still carry last round's broadcast __delta — stale
    // and colliding with this round's
    val state = state0.drop("__delta")
    val exactSum12 = (c: Column) =>
      sum(round(c, 12).cast("decimal(28,12)")).cast("double")
    val contribs = shjHint(state.where(col("outdeg").isNotNull))
      .join(e, state("node") === e("src"))
      .groupBy(col("dst").as("node"))
      .agg(exactSum12(col("rank") / col("outdeg")).as("in_sum"))
    val massCol = coalesce(
      exactSum12(when(col("outdeg").isNull, col("rank"))), lit(0.0)).as("mass")
    val dangling =
      (if (trackDelta)
        state.agg(massCol, deltaExpr(col("rank"), col("__prev")).as("__delta"))
      else state.agg(massCol))
        .withColumn("__k", Guards.constKey(col("mass")))
    val newRank = round(lit(teleport) / col("n") +
      lit(damping) * (coalesce(col("in_sum"), lit(0.0)) +
        col("mass") / col("n")), 12).as("rank")
    val joined = state.withColumnRenamed("rank", "__rold")
      .join(shjHint(contribs), Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(dangling), "__k")
    if (trackDelta)
      joined.select(col("node"), col("outdeg"), col("n"), newRank,
        col("__rold").as("__prev"), col("__delta"))
    else joined.select(col("node"), col("outdeg"), col("n"), newRank)
  }

  /** L1 delta of a state transition with 12-dp-rounded addends and exact
    * decimal summation — the same cross-engine determinism regime as the
    * rank sums, so an SQL oracle replays the identical stop decision. */
  private def deltaExpr(rank: Column, prev: Column): Column =
    sum(round(abs(rank - prev), 12).cast("decimal(28,12)")).cast("double")

  /** [[pageRank]] with a convergence stop instead of a fixed round count:
    * iterate until the L1 delta Σ|rank_k − rank_{k−1}| falls below `tol`
    * (or `maxIter` rounds), returning (node, rank, iters, l1_delta) so
    * callers can see what the stop actually was. This is the production
    * contract (PageRank's power iteration contracts at rate ~damping per
    * round, so tol=1e-9 lands in ~tens of rounds regardless of graph
    * size). After `iters` rounds the state is bit-identical to
    * `pageRank(e, iters)` ([[GraphClusterPlanSpec]] pins it), and the
    * data-dependent stop IS oracle-expressible: the driver's q182 oracle
    * unrolls `maxIter` gated rounds where a converged state passes
    * through unchanged and `iters`/`delta` freeze — a fixed-point
    * emulation in plain CTEs.
    *
    * Per round the delta rides the dangling-mass broadcast
    * ([[prRound]] `trackDelta`), so the stop check is a limit-1 probe of
    * the just-checkpointed state — round k+1's probe reads Δ_k. The loop
    * therefore runs one speculative round past the fixed point and hands
    * back the PREVIOUS state when the probe trips; output is identical
    * to checking Δ_k before round k+1, but k probes replace k full
    * aggregation jobs. */
  def pageRankConverged(edges: DataFrame, tol: Double, maxIter: Int = 50,
                        damping: Double = 0.85, teleport: Double = 0.15,
                        checkpointDir: Option[String] = None,
                        edgesPrepared: Boolean = false): DataFrame = {
    require(tol > 0 && maxIter >= 1, "need tol > 0 and maxIter >= 1")
    withStaticLoop(edges, edgesPrepared) {
    withDurable(edges, checkpointDir) { durable =>
    val e =
      if (edgesPrepared) edges.select(col("src"), col("dst"))
      else cut(edges.select(col("src"), col("dst")).distinct(), durable)
    val init = prInit(e).withColumn("__prev", lit(null).cast("double"))
    val (state, iters, delta) = probeLoop(init, durable, tol, maxIter,
      s => prRound(s, e, damping, teleport, trackDelta = true))
    state.select(col("node"), col("rank"),
      lit(iters).as("iters"), round(lit(delta), 12).as("l1_delta"))
    }
    }
  }

  /** The shared converged-iteration driver: run `round` (which must emit
    * a broadcast `__delta` column — null on the first round) until the
    * probed delta drops below `tol` or `maxIter` rounds, returning
    * (final state, rounds run, final delta). When round k+1's probe
    * shows Δ_k < tol the PREVIOUS state (round k) is returned — the
    * same state the eager-check loop would return. If `maxIter` caps
    * the loop instead, the final delta needs the one direct aggregate
    * the probe never ran. */
  private def probeLoop(init: DataFrame, durable: Boolean, tol: Double,
                        maxIter: Int, round: DataFrame => DataFrame,
                        capDelta: DataFrame => Double = st =>
                          st.agg(deltaExpr(col("rank"), col("__prev")))
                            .head().getDouble(0))
      : (DataFrame, Int, Double) = {
    val ret = new Retention
    var state = cut(init, durable, ret)
    var it = 0
    var result: DataFrame = null
    var delta = Double.NaN
    while (result == null && it < maxIter) {
      val next = cut(round(state), durable, ret)
      // limit-1 probe of the just-checkpointed state; a state with NO
      // ROWS (e.g. SSSP with zero matching seeds) is its own fixed
      // point — probe it as converged-at-zero instead of head()-ing an
      // empty frame
      val probed: Any = next.select(col("__delta")).take(1) match {
        case Array(row) => row.get(0)
        case _ => java.lang.Double.valueOf(0.0)
      }
      if (probed != null && probed.asInstanceOf[Double] < tol) {
        delta = probed.asInstanceOf[Double]
        result = state
      } else {
        state = next
        it += 1
      }
    }
    if (result == null) {
      // maxIter cap: the final round's delta was never probed (it would
      // ride the round after) — one direct aggregate over the final state
      delta = capDelta(state)
      result = state
    }
    (result, it, delta)
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
    require(iterations >= 1, "hits needs at least one iteration")
    withStaticLoop(edges, edgesPrepared) {
    withDurable(edges, checkpointDir) { durable =>
    // HITS joins edges on src (auth half-step) AND on dst (hub
    // half-step), so the cluster layout that zeroes per-round edge
    // movement is TWO one-time bucketed copies of the same deduped edge
    // set: `edges` bucketed by src and `edgesByDst` bucketed by dst
    // (pass both with edgesPrepared = true). One copy alone still halves
    // the per-round edge traffic. GraphClusterPlanSpec locks both
    // half-step plans edge-exchange-free and the hash parity vs the
    // default path.
    val (e, eDst) = hitsEdges(edges, edgesByDst, edgesPrepared, durable)
    val ret = new Retention
    var state = cut(hitsInit(e), durable, ret)
    var it = 0
    while (it < iterations) {
      // one cut PER HALF-STEP is deliberate: each half-step references
      // its input state twice (the contribution join and the score
      // re-attach), so an un-checkpointed auth output would have its
      // whole subtree re-executed in both branches of the hub step's
      // diamond — fusing the two cuts was tried in r09 and DOUBLED the
      // round's task time (q134 run_ms 65k → 135-178k); reverted.
      val afterAuth = cut(hitsAuthStep(state, e), durable, ret)
      state = cut(hitsHubStep(afterAuth, eDst), durable, ret)
      it += 1
    }
    state
    }
    }
  }

  /** Shared HITS edge preparation: on the default path BOTH edge copies
    * get the same distinct()+cut — an un-deduped dst-side copy would
    * silently double-count duplicate edges in the hub half-step while
    * the src side was deduped (r07 advice). Prepared callers own dedup
    * for both copies (a distinct here would destroy the bucketed scan's
    * output partitioning). */
  private def hitsEdges(edges: DataFrame, edgesByDst: Option[DataFrame],
                        edgesPrepared: Boolean, durable: Boolean)
      : (DataFrame, DataFrame) = {
    val prep = (d: DataFrame) =>
      if (edgesPrepared) d.select(col("src"), col("dst"))
      else cut(d.select(col("src"), col("dst")).distinct(), durable)
    val e = prep(edges)
    (e, edgesByDst.map(prep).getOrElse(e))
  }

  /** HITS state init: every node at hub = auth = 1/n. */
  private def hitsInit(e: DataFrame): DataFrame = {
    import graft.operators.Guards
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val meta = nodes.agg(count(lit(1)).as("n"))
      .withColumn("__k", Guards.constKey(col("n")))
    nodes
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(meta), "__k")
      .select(col("node"), round(lit(1.0) / col("n"), 12).as("hub"),
        round(lit(1.0) / col("n"), 12).as("auth"))
  }

  /** [[hits]] with the [[pageRankConverged]] L1 stop: iterate until
    * Σ round(|hub−hub'|,12) + Σ round(|auth−auth'|,12) < `tol` (or
    * `maxIter`), returning (node, hub, auth, iters, l1_delta). The delta
    * rides the hub half-step's existing one-row total broadcast
    * ([[hitsHubStep]] `trackDelta`) against the previous full iteration's
    * scores carried as `__phub`/`__pauth`, so the stop check is the same
    * limit-1 probe as PageRank's — no extra aggregation job per round.
    * After `iters` rounds the scores are bit-identical to
    * `hits(e, iters)`; the q183 oracle unrolls gated rounds (fixed-point
    * pass-through) exactly like q182's. */
  def hitsConverged(edges: DataFrame, tol: Double, maxIter: Int = 30,
                    checkpointDir: Option[String] = None,
                    edgesPrepared: Boolean = false,
                    edgesByDst: Option[DataFrame] = None): DataFrame = {
    require(tol > 0 && maxIter >= 1, "need tol > 0 and maxIter >= 1")
    withStaticLoop(edges, edgesPrepared) {
    withDurable(edges, checkpointDir) { durable =>
    val (e, eDst) = hitsEdges(edges, edgesByDst, edgesPrepared, durable)
    import graft.operators.Guards
    val init = hitsInit(e)
      .withColumn("__phub", lit(null).cast("double"))
      .withColumn("__pauth", lit(null).cast("double"))
    val hitsDelta = (st: DataFrame) =>
      st.agg((deltaExpr(col("hub"), col("__phub")) +
        deltaExpr(col("auth"), col("__pauth"))).as("__delta"))
    // the auth half-step output is re-referenced twice by the hub
    // half-step (contribution join + score re-attach) — cut it per round
    // or the whole auth subtree re-executes in both branches (the q134
    // diamond, r09: fused round ran at 2× the task time). Own retention
    // so durable runs keep O(1) auth states.
    val authRet = new Retention
    val (state, iters, delta) = probeLoop(init, durable, tol, maxIter, s => {
      // the iteration's delta (vs the carried previous scores) is ONE
      // one-row aggregate broadcast onto the new state — inside the
      // round's job, not a separate driver action
      val dAgg = hitsDelta(s).withColumn("__k", Guards.constKey(col("__delta")))
      // s may still carry last round's broadcast __delta; rebuild the
      // carry from scratch so this round's broadcast is the only one
      val carried = s.select(col("node"), col("hub"), col("auth"),
        col("hub").as("__phub"), col("auth").as("__pauth"))
      val afterAuth = cut(hitsAuthStep(carried, e), durable, authRet)
      hitsHubStep(afterAuth, eDst)
        .withColumn("__k", Guards.constKey(col("node")))
        .join(broadcast(dAgg), "__k")
        .drop("__k")
    }, capDelta = st => hitsDelta(st).head().getDouble(0))
    state.select(col("node"), col("hub"), col("auth"),
      lit(iters).as("iters"), round(lit(delta), 12).as("l1_delta"))
    }
    }
  }

  private def exactSum12Col(c: Column): Column =
    sum(round(c, 12).cast("decimal(28,12)")).cast("double")

  /** Columns a half-step must thread through untouched — the converged
    * loop's previous-score carry (__phub/__pauth) rides the state. */
  private def hitsExtras(state: DataFrame): Seq[Column] =
    state.columns.toSeq
      .filter(c => c != "node" && c != "hub" && c != "auth" && c != "__k")
      .map(col)

  /** HITS authority half-step: join state to edges on src, aggregate hub
    * mass by dst, L1-normalize. Edge side is exchange-free when e is
    * bucketed by src. */
  private[graft] def hitsAuthStep(state: DataFrame, e: DataFrame): DataFrame = {
    import graft.operators.Guards
    val aRaw = shjHint(state).join(e, state("node") === e("src"))
      .groupBy(col("dst").as("node"))
      .agg(exactSum12Col(col("hub")).as("raw"))
    val aTot = aRaw.agg(exactSum12Col(col("raw")).as("tot"))
      .withColumn("__k", Guards.constKey(col("tot")))
    state.drop("auth")
      .join(shjHint(aRaw), Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(aTot), "__k")
      .select(Seq(col("node"), col("hub"),
        round(coalesce(col("raw"), lit(0.0)) / col("tot"), 12).as("auth")) ++
        hitsExtras(state): _*)
  }

  /** HITS hub half-step (mirror of [[hitsAuthStep]] on dst): edge side is
    * exchange-free when eDst is bucketed by dst. */
  private[graft] def hitsHubStep(state: DataFrame, eDst: DataFrame): DataFrame = {
    import graft.operators.Guards
    val hRaw = shjHint(state).join(eDst, state("node") === eDst("dst"))
      .groupBy(col("src").as("node"))
      .agg(exactSum12Col(col("auth")).as("raw"))
    val hTot = hRaw.agg(exactSum12Col(col("raw")).as("tot"))
      .withColumn("__k", Guards.constKey(col("tot")))
    state.drop("hub")
      .join(shjHint(hRaw), Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(hTot), "__k")
      .select(Seq(col("node"),
        round(coalesce(col("raw"), lit(0.0)) / col("tot"), 12).as("hub"),
        col("auth")) ++ hitsExtras(state): _*)
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
    withDurable(edges, checkpointDir) { durable =>
    val ret = new Retention
    var known = cut(edges.select(col("src"), col("dst"), lit(1L).as("hops"))
      .groupBy("src", "dst").agg(min("hops").as("hops")), durable, ret)
    var reach = 1L
    while (reach < maxHops) {
      val doubled = known.alias("a")
        .join(known.alias("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"),
          (col("a.hops") + col("b.hops")).as("hops"))
      known = cut(known.unionByName(doubled)
        .groupBy("src", "dst").agg(min("hops").as("hops"))
        .where(col("hops") <= maxHops), durable, ret)
      reach *= 2
    }
    known
    }
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
    require(iterations >= 1, "personalizedPageRank needs at least one iteration")
    withDurable(edges, checkpointDir) { durable =>
    val e =
      if (edgesPrepared) edges.select(col("src"), col("dst"))
      else cut(edges.select(col("src"), col("dst")).distinct(), durable)
    val ret = new Retention
    var state = cut(pprInit(e, isSource), durable, ret)
    require(state.where(col("p") > 0).limit(1).count() == 1L,
      "personalizedPageRank: the source predicate matched no node")
    var it = 0
    while (it < iterations) {
      state = cut(pprRound(state, e, damping, teleport), durable, ret)
      it += 1
    }
    state.select(col("node"), col("rank"))
    }
  }

  /** PPR state init: (node, outdeg, p, rank=p) with p the seed-uniform
    * personalization vector. */
  private[graft] def pprInit(e: DataFrame, isSource: Column => Column)
      : DataFrame = {
    import graft.operators.Guards
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val meta = nodes.where(isSource(col("node")))
      .agg(count(lit(1)).as("ns"))
      .withColumn("__k", Guards.constKey(col("ns")))
    nodes.join(outdeg, Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(meta), "__k")
      .select(col("node"), col("outdeg"),
        round(when(isSource(col("node")),
          lit(1.0) / col("ns")).otherwise(lit(0.0)), 12).as("p"))
      .withColumn("rank", col("p"))
  }

  /** One PPR round — [[prRound]] with the teleport/dangling mass routed
    * to the personalization vector `p` instead of 1/n; `trackDelta` works
    * identically (delta rides the dangling broadcast, output re-carries
    * `__prev`). */
  private[graft] def pprRound(state0: DataFrame, e: DataFrame,
                              damping: Double, teleport: Double,
                              trackDelta: Boolean = false): DataFrame = {
    import graft.operators.Guards
    val state = state0.drop("__delta")
    val exactSum12 = (c: Column) =>
      sum(round(c, 12).cast("decimal(28,12)")).cast("double")
    val contribs = shjHint(state.where(col("outdeg").isNotNull))
      .join(e, state("node") === e("src"))
      .groupBy(col("dst").as("node"))
      .agg(exactSum12(col("rank") / col("outdeg")).as("in_sum"))
    val massCol = coalesce(
      exactSum12(when(col("outdeg").isNull, col("rank"))), lit(0.0)).as("mass")
    val dangling =
      (if (trackDelta)
        state.agg(massCol, deltaExpr(col("rank"), col("__prev")).as("__delta"))
      else state.agg(massCol))
        .withColumn("__k", Guards.constKey(col("mass")))
    val newRank = round(lit(teleport) * col("p") +
      lit(damping) * (coalesce(col("in_sum"), lit(0.0)) +
        col("mass") * col("p")), 12).as("rank")
    val joined = state.withColumnRenamed("rank", "__rold")
      .join(shjHint(contribs), Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(dangling), "__k")
    if (trackDelta)
      joined.select(col("node"), col("outdeg"), col("p"), newRank,
        col("__rold").as("__prev"), col("__delta"))
    else joined.select(col("node"), col("outdeg"), col("p"), newRank)
  }

  /** [[personalizedPageRank]] with the [[pageRankConverged]] L1 stop —
    * same probe-not-aggregate delta transport, same gated-unroll oracle
    * treatment (q184). Returns (node, rank, iters, l1_delta). */
  def personalizedPageRankConverged(edges: DataFrame,
                                    isSource: Column => Column,
                                    tol: Double, maxIter: Int = 50,
                                    damping: Double = 0.85,
                                    teleport: Double = 0.15,
                                    checkpointDir: Option[String] = None,
                                    edgesPrepared: Boolean = false)
      : DataFrame = {
    require(tol > 0 && maxIter >= 1, "need tol > 0 and maxIter >= 1")
    withDurable(edges, checkpointDir) { durable =>
    val e =
      if (edgesPrepared) edges.select(col("src"), col("dst"))
      else cut(edges.select(col("src"), col("dst")).distinct(), durable)
    val init = pprInit(e, isSource)
      .withColumn("__prev", lit(null).cast("double"))
    // seed-presence guard as limit-1 probes of the edge frame — the old
    // check ran init's whole pipeline (node distinct + outdeg joins) a
    // second time just to learn a seed exists (r09). Endpoints are
    // exposed AS `node` because caller predicates may reference the
    // column by name (q165/q184 do).
    def hasSeed(c: String): Boolean = e.select(col(c).as("node"))
      .where(isSource(col("node"))).limit(1).count() == 1L
    require(hasSeed("src") || hasSeed("dst"),
      "personalizedPageRankConverged: the source predicate matched no node")
    val (state, iters, delta) = probeLoop(init, durable, tol, maxIter,
      s => pprRound(s, e, damping, teleport, trackDelta = true))
    state.select(col("node"), col("rank"),
      lit(iters).as("iters"), round(lit(delta), 12).as("l1_delta"))
    }
  }

  /** One synchronous label-propagation round (Raghavan et al. 2007, the
    * self-vote stabilized variant): every node adopts the most frequent
    * label among its neighbors PLUS its own current label (one vote —
    * the retention term that damps the bipartite oscillation plain
    * synchronous LPA is prone to), ties to the smallest label. All
    * counting is integer-exact, so the argmax is engine-portable with
    * no decimal regime needed. `trackDelta` mirrors [[prRound]]: the
    * input carries `__prev` (last round's label, null on round one) and
    * the number of nodes whose label CHANGED in the transition the
    * input represents rides a one-row broadcast as `__delta`, making
    * the [[probeLoop]] stop (changed = 0 ⟺ delta < 0.5) a limit-1
    * probe. Edges must be an UNDIRECTED neighbor list (both directions
    * present), as [[labelPropagationConverged]] prepares. */
  private[graft] def lpaRound(state0: DataFrame, und: DataFrame,
                              trackDelta: Boolean = false): DataFrame = {
    import graft.operators.Guards
    val state = state0.drop("__delta")
    // CHANGED-NEIGHBOR vote recomputation (r10, verdict item 7): a
    // node's winning label is a deterministic function of the multiset
    // {own label} ∪ {neighbor labels}, so only nodes with a changed
    // neighbor — or a changed own label — can flip; every other node's
    // recomputed winner would equal the winner it already carries.
    // Recompute votes for that AFFECTED set only and carry everyone
    // else's label through a left join. Round one (`__prev` null, the
    // [[ssspRound]] frontier convention) marks every node changed, so
    // the first round is the full recomputation it must be. The label
    // sequence, change census, iters and output are bit-identical to
    // the full-recompute form the oracle's gated unroll replays.
    val frontier = state.where(
        col("__prev").isNull || col("lab") =!= col("__prev"))
      .select(col("node"))
    val affected = frontier
      .unionByName(und.join(frontier.withColumnRenamed("node", "a"), "a")
        .select(col("b").as("node")))
      .distinct()
    val votes = und
      .join(affected.withColumnRenamed("node", "b"), "b")
      .join(shjHint(state), und("a") === state("node"))
      .select(col("b").as("node"), col("lab"))
      .unionByName(state
        .join(affected, Seq("node"), "left_semi")
        .select(col("node"), col("lab")))
    val winner = votes.groupBy(col("node"), col("lab"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("node"))
      .agg(min(struct((-col("cnt")).as("nc"), col("lab").as("l")))
        .getField("l").as("newlab"))
    val joined = state.withColumnRenamed("lab", "__lold")
      .join(shjHint(winner), Seq("node"), "left")
      .withColumn("__lab", coalesce(col("newlab"), col("__lold")))
    if (trackDelta) {
      val changed =
        state.agg(sum((col("lab") =!= col("__prev")).cast("long"))
          .cast("double").as("__delta"))
        .withColumn("__k", Guards.constKey(col("__delta")))
      joined
        .withColumn("__k", Guards.constKey(col("node")))
        .join(broadcast(changed), "__k")
        .select(col("node"), col("__lab").as("lab"),
          col("__lold").as("__prev"), col("__delta"))
    } else joined.select(col("node"), col("__lab").as("lab"))
  }

  /** Community detection by synchronous label propagation run to its
    * fixed point: iterate [[lpaRound]] until NO node changes label (or
    * `maxIter` rounds — synchronous LPA can oscillate on pathological
    * structures; the self-vote damps the common cases and the cap
    * bounds the rest, deterministically either way). Returns
    * (node, label, iters, changed) where `label` is the community id
    * (the minimal member id in the usual converged case) and `changed`
    * is the stop transition's change count (0 at a true fixed point).
    * Same probe transport and gated-unroll oracle treatment as
    * [[pageRankConverged]] (q188). Per round: one state⋈edges shuffle
    * join + two integer aggregations — edge side exchange-free under
    * the same src-bucketed layout as PageRank's. */
  def labelPropagationConverged(edges: DataFrame, maxIter: Int = 20,
                                checkpointDir: Option[String] = None)
      : DataFrame = {
    require(maxIter >= 1, "labelPropagationConverged needs maxIter >= 1")
    withDurable(edges, checkpointDir) { durable =>
    val e = edges.select(col("src"), col("dst"))
    val und = cut(
      e.select(col("src").as("a"), col("dst").as("b"))
        .unionByName(e.select(col("dst").as("a"), col("src").as("b")))
        .where(col("a") =!= col("b")).distinct(), durable)
    val init = und.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("lab"),
        lit(null).cast("string").as("__prev"))
    // changed = 0 stops; tol 0.5 on the integer-valued change count
    val (state, iters, changed) = probeLoop(init, durable, 0.5, maxIter,
      s => lpaRound(s, und, trackDelta = true),
      capDelta = st => st.agg(
        sum((col("lab") =!= col("__prev")).cast("long")).cast("double"))
        .head().getDouble(0))
    state.select(col("node"), col("lab").as("label"),
      lit(iters).as("iters"), lit(changed).cast("long").as("changed"))
    }
  }

  /** Exact per-node triangle counts by degree-ordered edge orientation
    * (Suri & Vassilvitskii, WWW'11 — the MapReduce triangle-counting
    * discipline; also Schank & Wagner's forward algorithm). The naive
    * wedge generator joins the adjacency list with itself on the center
    * node, so its volume is Σ deg(v)² — a single celebrity node with
    * degree 10⁶ contributes 10¹² wedges. Orienting every edge from its
    * lower-(degree, id) endpoint to its higher one makes each triangle
    * countable exactly once from its minimum vertex, and caps every
    * node's OUT-degree at O(√m) (a node with out-degree d has d
    * neighbors of degree ≥ its own, so d² ≤ 2m) — wedge volume falls
    * from Σ deg² to Σ outdeg² ≤ m^1.5, the bound that survives skew at
    * 100 TB. Ties break on node id, so the orientation is a total order
    * and both engines replay it exactly.
    *
    * Three shuffle joins, no iteration: degrees (one groupBy over both
    * endpoint projections), wedges (oriented ⋈ oriented on the center),
    * closure (wedges ⋈ oriented on the far pair). Each closed triangle
    * (u,v,w) credits all three vertices via a 3-row explode; the final
    * count is an integer groupBy. Returns (node, triangles), nodes with
    * ≥1 triangle only. */
  def triangleCount(edges: DataFrame): DataFrame = {
    // und feeds the degree census (two endpoint projections) and the
    // orientation join, and `oriented` feeds both wedge sides plus the
    // closure lookup — without explicit cuts the (typically expensive)
    // edge-construction subtree re-executes per branch (measured 44 s →
    // 13 s at sf0.1 from these two lines)
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient a→b when (deg_a, a) < (deg_b, b), else b→a; spelled as an
    // explicit lexicographic test so the oracle's SQL is word-for-word
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint()
    // wedges from the center u: unordered neighbor pairs, ordered by the
    // SAME (deg, id) total order so the closing edge is looked up in its
    // oriented direction
    val e1 = oriented.as("e1"); val e2 = oriented.as("e2")
    val wedges = e1.join(e2, col("e1.u") === col("e2.u") &&
        (col("e1.dv") < col("e2.dv") ||
          (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("u"), col("e1.v").as("x"), col("e2.v").as("y"))
    val closing = oriented.select(col("u").as("x"), col("v").as("y"))
    val triangles = wedges.join(closing, Seq("x", "y"))
    triangles
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** k-core: the maximal subgraph where every member has ≥ k neighbors
    * INSIDE the subgraph (Seidman 1983; Batagelj-Zaveršnik peeling) —
    * the graph-topology quality gate (a crawl/citation node's coreness
    * separates connected-but-peripheral from densely-embedded far more
    * robustly than raw degree, which a single spam hub inflates).
    * Synchronous distributed peeling: every round recomputes each live
    * node's degree among live nodes and kills all nodes under k AT ONCE;
    * monotone (the live set only shrinks), so it reaches the unique
    * fixed point in at most peel-depth rounds — each round is one
    * state⋈edges shuffle join + one integer aggregation, the PageRank
    * round shape, and at 100 TB the same src-bucketed edge layout makes
    * the edge side exchange-free.
    *
    * The kill census rides the round's one-row broadcast ([[probeLoop]]
    * transport): zero kills stops the loop as a limit-1 probe. Because
    * peeling is monotone, the capped run equals the gated run wherever
    * maxIter ≥ peel depth, and the oracle can unroll rounds UNGATED —
    * a converged round recomputes the identical live set, so the unroll
    * is naturally idempotent past the fixed point (no MATERIALIZED
    * state gating needed; contrast q188's oscillation-capable LPA).
    * Returns core members only: (node, core_deg, iters) with
    * core_deg ≥ k by construction. */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 30,
            checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1 && maxIter >= 1, "kCore needs k >= 1 and maxIter >= 1")
    withDurable(edges, checkpointDir) { durable =>
    val e = edges.select(col("src"), col("dst"))
    val und = cut(
      e.select(col("src").as("a"), col("dst").as("b"))
        .unionByName(e.select(col("dst").as("a"), col("src").as("b")))
        .where(col("a") =!= col("b")).distinct(), durable)
    // state carries the MAINTAINED live-degree (r10, verdict item 7):
    // init = full degree (every und node appears as `a` — both edge
    // directions are present), each round then only DECREMENTS by the
    // edges incident to last round's kills instead of recomputing the
    // degree census over all live edges (see [[kcoreRound]]).
    val init = und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
      .select(col("node"), lit(true).as("alive"), col("deg"),
        lit(null).cast("boolean").as("__prev"))
    val (state, iters, _) = probeLoop(init, durable, 0.5, maxIter,
      s => kcoreRound(s, und, k),
      capDelta = st => st.agg(
        sum((col("alive") =!= col("__prev")).cast("long")).cast("double"))
        .head().getDouble(0))
    val core = state.where(col("alive")).select(col("node"))
    val coreDeg = und
      .join(core.withColumnRenamed("node", "a"), "a")
      .join(core.withColumnRenamed("node", "b"), "b")
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("core_deg"))
    core.join(coreDeg, Seq("node"))
      .select(col("node"), col("core_deg"), lit(iters).as("iters"))
    }
  }

  /** One synchronous peel round, DECREMENT-ONLY (r10, verdict item 7):
    * instead of recomputing every live node's degree among live nodes
    * (two |live-edges|-sized joins per round — the r09 shape), the
    * state's maintained `deg` is decremented by the edges incident to
    * the nodes KILLED in the previous transition (__prev ∧ ¬alive), so
    * the per-round join volume is |edges touching the kill frontier|,
    * not |live edges| — the frontier-compaction argument of
    * [[ssspRound]] applied to peeling. Equivalence (inductive): deg at
    * round t equals the degree among the round-(t−1) live set — init is
    * the full degree (= degree among the all-alive set), and each dead
    * node decrements each neighbor exactly once, in the round after it
    * died. The alive sequence, probe census, iters and final output are
    * bit-identical to the recompute form (the oracle's UNGATED unroll
    * replays the recompute recurrence and hash-matches). Round one's
    * kill frontier is empty by construction (__prev is null). The kill
    * census rides the broadcast like [[lpaRound]]'s change census. */
  private[graft] def kcoreRound(state0: DataFrame, und: DataFrame,
                                k: Int): DataFrame = {
    import graft.operators.Guards
    val state = state0.drop("__delta")
    val killed = state.where(col("__prev") && !col("alive"))
      .select(col("node").as("b"))
    val dec = und
      .join(killed, "b")
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("__dec"))
    val flips = state.agg(
        sum((col("alive") =!= col("__prev")).cast("long"))
          .cast("double").as("__delta"))
      .withColumn("__k", Guards.constKey(col("__delta")))
    val newDeg = col("__dold") - coalesce(col("__dec"), lit(0L))
    state.select(col("node"), col("alive").as("__aold"),
        col("deg").as("__dold"))
      .join(shjHint(dec), Seq("node"), "left")
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(flips), "__k")
      .select(col("node"),
        (col("__aold") && newDeg >= k).as("alive"),
        newDeg.as("deg"),
        col("__aold").as("__prev"), col("__delta"))
  }

  /** Multi-source WEIGHTED shortest paths: synchronous Bellman–Ford
    * relaxation over an edge DataFrame (src, dst, w) with non-negative
    * integer weights — the weighted companion to [[bfsHops]], and the
    * distributed regime of the problem [[floydWarshall]] solves densely
    * on the driver (the reference's scipy APSP, HwyNetwork.py:227-294,
    * is the broadcastable small-graph case; this is the plan when the
    * GRAPH is the big data). The state holds only REACHED nodes
    * (frontier-compact: unreached nodes cost nothing), and each round is
    * one state⋈edges equi-join + one min-aggregation — relaxing ALL
    * edges out of the reached set at once, so the round count is bounded
    * by the weighted-path hop depth, not by node count.
    *
    * All arithmetic is integer (`dist` is BIGINT), so determinism is
    * free — no decimal regime needed. Distances are monotone
    * non-increasing and the reached set monotone non-decreasing, so a
    * converged round recomputes the same state and an oracle can unroll
    * rounds UNGATED (the [[kCore]] treatment). The stop is probed: the
    * change census (newly-reached + strictly-improved rows) rides each
    * round's one-row broadcast and the loop stops when a transition
    * changed nothing, via the shared [[probeLoop]] transport —
    * `iters` = 1 + the number of state-changing transitions.
    *
    * `isSource` must be an engine-portable predicate over the node id.
    * Returns (node, dist, iters) for reached nodes only. Cluster note:
    * like [[pageRank]], bucketing edges by `src` makes every round's
    * join exchange-free on the edge side. */
  def sssp(edges: DataFrame, isSource: Column => Column, maxIter: Int = 30,
           checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter >= 1, "sssp needs maxIter >= 1")
    withDurable(edges, checkpointDir) { durable =>
    val e = cut(edges.select(col("src"), col("dst"),
      col("w").cast("long").as("w")), durable)
    val init = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .where(isSource(col("node")))
      .select(col("node"), lit(0L).as("dist"),
        lit(null).cast("long").as("__prev"))
    val (state, iters, _) = probeLoop(init, durable, 0.5, maxIter,
      s => ssspRound(s, e),
      capDelta = st => st.agg(ssspCensus(st)).head().getDouble(0))
    state.select(col("node"), col("dist"), lit(iters).as("iters"))
    }
  }

  /** Change census of the transition an SSSP state represents: newly
    * reached (`__prev` null) + strictly improved rows. Coalesced to 0 so
    * an EMPTY state (no seed matched the graph) probes as converged on
    * round one instead of sum()'s null spinning the loop to maxIter. */
  private def ssspCensus(state: DataFrame): Column =
    coalesce(sum((col("__prev").isNull || col("dist") < col("__prev"))
      .cast("long")), lit(0L)).cast("double")

  /** One relaxation round. Census first (over the INPUT state — the
    * probe-transport contract: round k's output carries transition
    * k−1's census as `__delta`): a row changed if it is newly reached
    * (`__prev` null) or strictly improved. Then relax every edge out of
    * the reached set and fold old state + candidates in ONE
    * min-aggregation — the old distance rides the union as `__prevc`
    * (candidates carry null), so `min(__prevc)` reconstructs "previous
    * distance, null if newly reached" without a second join. */
  private[graft] def ssspRound(state0: DataFrame, e: DataFrame): DataFrame = {
    import graft.operators.Guards
    val state = state0.drop("__delta")
    val census = state.agg(ssspCensus(state).as("__delta"))
      .withColumn("__k", Guards.constKey(col("__delta")))
    // FRONTIER-ONLY relaxation (r09, opt guide §2.3): only rows whose
    // distance changed in the previous transition (`__prev` null = newly
    // reached, dist < __prev = improved) can produce a candidate that
    // wins the min-fold — an unchanged node's out-offers were already
    // folded in the round after it last changed, and relaxation is
    // monotone, so dropping them leaves every round's STATE bit-identical
    // while the join carries |frontier|·deg rows instead of |state|·deg.
    val frontier = state.where(
      col("__prev").isNull || col("dist") < col("__prev"))
    val relax = shjHint(frontier).join(e, col("node") === col("src"))
      .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"),
        lit(null).cast("long").as("__prevc"))
    state.select(col("node"), col("dist"), col("dist").as("__prevc"))
      .unionByName(relax)
      .groupBy("node")
      .agg(min("dist").as("dist"), min("__prevc").as("__prev"))
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(census), "__k")
      .select(col("node"), col("dist"), col("__prev"), col("__delta"))
  }

  /** Sampled betweenness centrality (Brandes 2001; sampled-pivot
    * estimation per Brandes & Pich 2007) over an UNWEIGHTED directed
    * edge frame — the "bridge node" readout that closeness (q194)
    * cannot see: a node all shortest paths squeeze through scores high
    * here even when it is far from everything. Hop-limited: only
    * shortest paths of ≤ `maxHops` hops contribute (the k-betweenness
    * variant) — the cap is what bounds BOTH the round count and the
    * σ path counts, and makes a fixed SQL unroll total.
    *
    * Two phases, both rounds of keyed equi-joins (the [[pageRank]]
    * cost shape; src-bucketed edges make the forward side
    * exchange-free at scale):
    *  - FORWARD: per-seed BFS with path counting. State is settled
    *    (seed, node, hop, σ) — σ the exact BIGINT number of shortest
    *    paths; each round expands the hop-h frontier through the edge
    *    set, sums σ over predecessors, and anti-joins already-settled
    *    pairs. k seeds advance in the SAME rounds ([[ssspPerSeed]]'s
    *    transport), so rounds = min(reached depth, maxHops), not
    *    k × depth.
    *  - BACKWARD: Brandes dependency accumulation by DESCENDING hop
    *    level: δ(v) = Σ_{w succ, hop(w)=hop(v)+1} (σv/σw)·(1+δ(w)).
    *    Level h's δ is final when computed (all deeper levels done),
    *    so each level is one join + one aggregation. Levels above the
    *    reached depth are structural no-ops, so the loop (and the
    *    oracle's unroll) runs maxHops−1 … 1 unconditionally.
    *
    * Determinism: σ is exact integer; δ addends are one IEEE division
    * + one multiply of 6-dp-grid values rounded at 12 dp and summed as
    * exact DECIMAL(38,12); δ re-grids at 6 dp per level — the [[Pca]]
    * regime, so the oracle replays every level bit-for-bit. Returns
    * (node, betweenness) for nodes with positive score (hop-0 seed
    * self-rows excluded — a seed still scores via OTHER seeds' trees).
    */
  def betweennessSampled(edges: DataFrame, isSource: Column => Column,
                         maxHops: Int,
                         checkpointDir: Option[String] = None,
                         edgesPrepared: Boolean = false,
                         edgesByDst: Option[DataFrame] = None): DataFrame = {
    require(maxHops >= 2, "betweennessSampled needs maxHops >= 2")
    withStaticLoop(edges, edgesPrepared) {
    withDurable(edges, checkpointDir) { durable =>
    // forward expands through e on src, backward pushes dependency back
    // through eDst on dst — the HITS dual-copy cluster layout applies
    // verbatim ([[hitsEdges]]: pass src- and dst-bucketed copies with
    // edgesPrepared = true and both phases are edge-exchange-free)
    val (e, eDst) = hitsEdges(edges, edgesByDst, edgesPrepared, durable)
    val ret = new Retention
    var settled = cut(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct()
        .where(isSource(col("node")))
        .select(col("node").as("seed"), col("node"),
          lit(0).as("hop"), lit(1L).as("sigma")), durable, ret)
    var h = 0
    var growing = true
    while (growing && h < maxHops) {
      settled = cut(settled.unionByName(
        betwForwardRound(settled, e, h)), durable, ret)
      growing = settled.where(col("hop") === h + 1).limit(1).count() > 0
      h += 1
    }
    // deepest populated hop: when the loop stopped on `growing`, round
    // h's expansion found nothing, so hop h is empty
    val deepest = if (growing) h else h - 1
    // Backward accumulation on PER-LEVEL frames (r09): hop h's δ depends
    // only on hop h+1's FINAL δ and the hop-h settled rows, so each level
    // is one join + one aggregation over LEVEL-sized frames — the old
    // formulation rebuilt (filter ≠lv ∪ updated lv) and re-checkpointed
    // the ENTIRE settled state once per level, paying |state| scan+write
    // × levels for data that never changes again. δ values, the level
    // order and every rounding site are unchanged (the oracle's unroll
    // replays the same recurrence); only which rows ride each checkpoint
    // differs. Levels above deepest−1 stay structural no-ops and are
    // still skipped on the engine side.
    // Level frames are UNTRACKED cuts (r10, advice item 1): every level
    // is re-read by the FINAL union after later levels checkpoint, and
    // `settled` itself is re-sliced per level — the keep-newest-2
    // retention invariant does not hold for either, so tracking them
    // (as r09 did) had a durable run with deepest >= 3 deleting the
    // settled checkpoint (and all but two levels) out from under the
    // final aggregate. Untracked frames are bounded by maxHops per
    // invocation — the same boundedness argument as the edge set.
    val levels = scala.collection.mutable.Map.empty[Int, DataFrame]
    if (deepest >= 1) {
      levels(deepest) = cut(settled.where(col("hop") === deepest)
        .withColumn("delta", lit(0.0)), durable)
      var lv = math.min(maxHops - 1, deepest - 1)
      while (lv >= 1) {
        levels(lv) = cut(betwBackwardLevelFrames(
          settled.where(col("hop") === lv), levels(lv + 1), eDst),
          durable)
        lv -= 1
      }
    }
    val scored =
      if (deepest >= 1)
        (1 to deepest).map(levels).reduce(_ unionByName _)
      else settled.withColumn("delta", lit(0.0)).where(col("hop") > 0)
    scored
      .groupBy("node")
      .agg(round(betwSumDec12(col("delta")), 6).as("betweenness"))
      .where(col("betweenness") > 0)
    }
    }
  }

  private def betwSumDec12(c: Column): Column =
    sum(round(c, 12).cast("decimal(38,12)")).cast("double")

  /** Approximate neighborhood function N(h) — the number of (u, v)
    * pairs within h hops — by per-node mergeable bottom-k (KMV)
    * sketches propagated along edges (ANF, Palmer et al. KDD'02;
    * HyperBall, Boldi & Vigna 2013, with KMV in place of HyperLogLog
    * because the repo's md5-derived KMV is ENGINE-PORTABLE — a binary
    * HLL register file is not, so this stays DuckDB-oracled). N(h)'s
    * growth curve is the scale-robust way to read a graph's effective
    * diameter and connectivity mass: exact answers need all-pairs
    * closure (O(n²) state — [[bfsHops]] is that regime), while the
    * sketch state is k longs per node at ANY graph size.
    *
    * Per round: each node's sketch absorbs its out-neighbors' sketches
    * — explode to (node, hash), distinct (map-side combinable), keep
    * the k smallest per node under one keyed window, re-pack. Bottom-k
    * of a union IS the bottom-k of unioned bottom-k's, so truncation
    * per round is lossless for the estimator. Two node-keyed shuffles
    * per round; the src-bucketed edge layout removes the edge-side
    * exchange as usual. (A custom TypedImperativeAggregate that
    * truncates partial states to k would halve the shuffled bytes —
    * the production refinement; the window formulation keeps every
    * intermediate bounded and portable.)
    *
    * Estimator: with fewer than k distinct hashes the sketch IS the
    * set (exact count); at k, |R| ≈ (k−1)·2⁶⁰ / kth-smallest (hashes
    * uniform on [0, 2⁶⁰) — [[graft.functions.Text.md5Hash64]]'s
    * range). Both branches are single IEEE ops on exact integers, so
    * the per-node estimate is engine-exact after round-4; per-hop
    * totals sum as exact DECIMAL(38,4). Returns one row per hop:
    * (hop, n_nodes, est_pairs). */
  def neighborhoodFunction(edges: DataFrame, k: Int, maxHops: Int,
                           seed: Int = 7,
                           checkpointDir: Option[String] = None)
      : DataFrame = {
    require(k >= 2 && maxHops >= 1, "need k >= 2 and maxHops >= 1")
    withDurable(edges, checkpointDir) { durable =>
    val e = cut(edges.select(col("src"), col("dst")).distinct(), durable)
    val ret = new Retention
    var state = cut(
      e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct()
        .select(col("node"), array(graft.functions.Text
          .md5Hash64(col("node").cast("string"), seed)).as("kmv")),
      durable, ret)
    // (k−1)·2^60 as ONE exact literal — both engines parse the same
    // constant instead of re-deriving it in their own literal types
    val scaleC = (k - 1).toDouble * 1.152921504606846976e18
    val estCol = when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
      .otherwise(lit(scaleC) / element_at(col("kmv"), k))
    val out = (1 to maxHops).map { h =>
      val contrib = e.join(shjHint(state), e("dst") === state("node"))
        .select(e("src").as("node"), col("kmv"))
      // ONE node-keyed shuffle per round. Preferred: the native
      // graft_bottomk aggregate — its PARTIAL states are already
      // truncated to k (bottom-k of a union is the bottom-k of unioned
      // bottom-k's), so the exchange ships ≤8k bytes per group however
      // many distinct hashes a partition saw. Fallback: collect_set +
      // sort + slice — value-identical, but partial states carry every
      // distinct hash (a first cut spelled the round as distinct →
      // keyed window → collect_list: THREE wide shuffles with sorts;
      // steady 70.3 s → 14.7 s at sf0.1 from collapsing to one).
      val hashes = state.select(col("node"), explode(col("kmv")).as("h"))
        .unionByName(contrib.select(col("node"), explode(col("kmv")).as("h")))
      val bottomK =
        if (graft.GraftExtensions.has(edges.sparkSession, "graft_bottomk"))
          call_function("graft_bottomk", col("h"), lit(k))
        else slice(array_sort(collect_set(col("h"))), 1, k)
      state = cut(hashes.groupBy("node").agg(bottomK.as("kmv")),
        durable, ret)
      val row = state.agg(count(lit(1)).as("n"),
        coalesce(sum(round(estCol, 4).cast("decimal(38,4)")).cast("double"),
          lit(0.0)).as("p"))
        .head()
      (h, row.getLong(0), row.getDouble(1))
    }
    val s = edges.sparkSession
    import s.implicits._
    out.toDF("hop", "n_nodes", "est_pairs")
    }
  }

  /** One forward Brandes round: expand the hop-`h` frontier through the
    * edge set (exchange-free on the edge side when `e` is bucketed by
    * src — [[GraphClusterPlanSpec]] locks it), sum σ over predecessors,
    * anti-join already-settled pairs. Returns the NEW hop-(h+1) rows. */
  private[graft] def betwForwardRound(settled: DataFrame, e: DataFrame,
                                      h: Int): DataFrame = {
    val frontier = settled.where(col("hop") === h)
    val cand = shjHint(frontier).join(e, frontier("node") === e("src"))
      .groupBy(col("seed"), col("dst").as("node"))
      .agg(sum("sigma").as("sigma"))
    cand.join(settled, Seq("seed", "node"), "left_anti")
      .select(col("seed"), col("node"), lit(h + 1).as("hop"), col("sigma"))
  }

  /** One backward Brandes level on per-level frames: hop-(lv+1)
    * dependencies (`upDelta`) are FINAL — push (σv/σw)·(1+δw) down one
    * level through `eDst` (exchange-free on the edge side when bucketed
    * by dst) and re-grid at 6 dp. `down` is the hop-lv settled slice
    * (seed, node, hop, sigma); returns it with its final `delta`. */
  private[graft] def betwBackwardLevelFrames(down: DataFrame,
      upDelta: DataFrame, eDst: DataFrame): DataFrame = {
    val up = upDelta.alias("w")
    val contrib = shjHint(up).join(eDst, col("w.node") === eDst("dst"))
      .select(col("w.seed").as("seed"), col("src").as("node"),
        col("w.sigma").as("sw"), col("w.delta").as("dw"))
    val dsum = down.join(shjHint(contrib), Seq("seed", "node"))
      .groupBy(col("seed"), col("node"))
      .agg(round(betwSumDec12(
        (col("sigma").cast("double") / col("sw")) *
          (lit(1.0) + col("dw"))), 6).as("dnew"))
    down.select(col("seed"), col("node"), col("hop"), col("sigma"))
      .join(shjHint(dsum), Seq("seed", "node"), "left")
      .select(col("seed"), col("node"), col("hop"), col("sigma"),
        coalesce(col("dnew"), lit(0.0)).as("delta"))
  }

  /** Newman modularity of a node partition (Newman & Girvan 2004,
    * eq. 5): Q = Σ_c [ m_c/m − (d_c/(2m))² ] over the undirected
    * simple graph, where m is the undirected edge count, m_c the edges
    * with both endpoints in community c, and d_c the degree mass of c.
    * This is the standard quality readout for a community assignment
    * ([[labelPropagationConverged]]'s output): Q ≈ 0 means the
    * partition is no better than the degree-preserving random graph,
    * Q ≳ 0.3 means real structure — the number a curation pipeline
    * checks before trusting community-level sampling decisions.
    *
    * One bounded pass, no iteration: canonicalize edges to distinct
    * a<b pairs (one shuffle), label both endpoints (two node-keyed
    * joins — `labels` is node-scale, so at 100 TB these shuffle on the
    * node key like every round of the iterative family), then three
    * integer aggregations (m, per-community degree mass, per-community
    * intra edges) with the totals riding one-row constKey broadcasts.
    *
    * Determinism: every count is exact BIGINT; each community's
    * contribution is two IEEE divisions + one multiply + one subtract
    * on exact integers, pround-ed at 12 dp (intra/m is a
    * small-denominator rational — exactly the half-grid-point class
    * where built-in round() diverges across engines); the global Q
    * sums the rounded contributions as exact decimal — the
    * [[pageRank]] regime, so a SQL oracle replays it bit-for-bit.
    *
    * Returns one row per community: (label, nodes, deg_sum,
    * intra_edges, q_contrib, modularity) with `modularity` the global
    * Q repeated on every row (the driver-gate-friendly shape). */
  def modularity(edges: DataFrame, labels: DataFrame,
                 nodeCol: String = "node", labCol: String = "label")
      : DataFrame = {
    import graft.operators.Guards
    val lab = labels.select(col(nodeCol).as("node"), col(labCol).as("lab"))
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint()
    val mRow = und.agg(count(lit(1)).cast("double").as("m"))
      .withColumn("__k", Guards.constKey(col("m")))
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val dc = lab.join(deg, Seq("node"))
      .groupBy(col("lab"))
      .agg(count(lit(1)).as("nodes"), sum(col("deg")).as("deg_sum"))
    val intra = und
      .join(lab.select(col("node").as("a"), col("lab").as("la")), "a")
      .join(lab.select(col("node").as("b"), col("lab").as("lb")), "b")
      .where(col("la") === col("lb"))
      .groupBy(col("la").as("lab")).agg(count(lit(1)).as("intra_edges"))
    val perC = dc.join(intra, Seq("lab"), "left")
      .withColumn("__k", Guards.constKey(col("lab")))
      .join(broadcast(mRow), "__k")
      .select(col("lab").as("label"), col("nodes"), col("deg_sum"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        // pround, not round: intra/m is a small-denominator rational
        // (m = exact edge count), so the 12-dp value can land exactly
        // on a half grid point where Spark/DuckDB round() diverge
        graft.functions.Exprs.pround(
          coalesce(col("intra_edges"), lit(0L)) / col("m") -
          (col("deg_sum") / (lit(2.0) * col("m"))) *
          (col("deg_sum") / (lit(2.0) * col("m"))), 12).as("q_contrib"))
    val qTot = perC.agg(
        sum(col("q_contrib").cast("decimal(28,12)")).cast("double").as("q"))
      .withColumn("__k", Guards.constKey(col("q")))
    perC.withColumn("__k", Guards.constKey(col("label")))
      .join(broadcast(qTot), "__k")
      .select(col("label"), col("nodes"), col("deg_sum"),
        col("intra_edges"), col("q_contrib"),
        graft.functions.Exprs.pround(col("q"), 12).as("modularity"))
  }

  /** Deterministic random-walk corpus generation (DeepWalk, Perozzi et
    * al. KDD'14; node2vec's p=q=1 case) — turn a graph into the
    * sequence corpus a skip-gram embedding trainer consumes. Each
    * seed launches `walksPerSeed` walkers; at step t a walker at node
    * u moves to the neighbor v minimizing
    * md5(seed:walk_id:t:v) — a hash-argmin stand-in for uniform
    * neighbor sampling that is exactly replayable on any engine (no
    * RNG state, the [[graft.functions.Text.md5Hash64]] convention),
    * while still decorrelating walks across walkers and steps.
    *
    * Per step: one walker⋈edges equi-join on the current node + one
    * min-struct aggregation per walker — the [[pageRank]] round shape
    * (src-bucketed edges make the edge side exchange-free at scale),
    * `walkLen` bounded rounds, walker-scale state. Walks move on the
    * UNDIRECTED view so no walker dead-ends. Returns one row per walk:
    * (walk_id, steps, walk) with `walk` the space-joined node
    * sequence — the training-corpus shape. */
  def randomWalks(edges: DataFrame, isSeed: Column => Column,
                  walkLen: Int, walksPerSeed: Int = 1, seed: Int = 7,
                  checkpointDir: Option[String] = None): DataFrame = {
    require(walkLen >= 1 && walksPerSeed >= 1,
      "randomWalks needs walkLen >= 1 and walksPerSeed >= 1")
    withDurable(edges, checkpointDir) { durable =>
    val e = edges.select(col("src"), col("dst"))
    val und = cut(
      e.select(col("src").as("a"), col("dst").as("b"))
        .unionByName(e.select(col("dst").as("a"), col("src").as("b")))
        .where(col("a") =!= col("b")).distinct(), durable)
    val ret = new Retention
    val reps = array((1 to walksPerSeed).map(lit): _*)
    // the walk string rides the frontier state and grows by one token
    // per step (r08 verdict nit): the former shape accumulated a
    // walkLen-wide union of checkpointed frontiers and re-shuffled the
    // WHOLE trace through a final collect_list + array_sort — at long
    // walks that moves every (wid, step, node) row twice. Carrying the
    // append on the state moves each walk string once per round and
    // makes the output a plain projection of the final frontier. No
    // walker can dead-end (seeds and successors are always `und`
    // endpoints and `und` is symmetric), so the output is row-for-row
    // identical to the trace formulation — steps is walkLen+1 for
    // every walker by construction.
    var frontier = cut(
      und.select(col("a").as("node")).distinct()
        .where(isSeed(col("node")))
        .select(explode(reps).as("r"), col("node"))
        .select(concat(col("node").cast("string"), lit("#"), col("r"))
          .as("wid"), col("node"),
          col("node").cast("string").as("walk")), durable, ret)
    var t = 1
    while (t <= walkLen) {
      val hashed = shjHint(frontier).join(und, frontier("node") === und("a"))
        .select(col("wid"), col("walk"),
          struct(graft.functions.Text.md5Hash64(
            concat(col("wid"), lit(":"), lit(t.toString), lit(":"),
              col("b").cast("string")), seed).as("h"),
            col("b").as("n")).as("hn"))
      frontier = cut(hashed.groupBy("wid")
        .agg(min(col("hn")).getField("n").as("node"),
          min(col("walk")).as("__w"))
        .select(col("wid"), col("node"),
          concat(col("__w"), lit(" "), col("node").cast("string"))
            .as("walk")), durable, ret)
      t += 1
    }
    frontier.select(col("wid").as("walk_id"),
      lit(walkLen + 1L).as("steps"), col("walk"))
    }
  }

  /** Skip-gram (center, context) pair extraction over a walk corpus
    * (word2vec's data layer — Mikolov et al. 2013, applied to
    * [[randomWalks]] output exactly as DeepWalk prescribes): every
    * ordered pair of positions within `window` of each other in the
    * same walk, counted corpus-wide. One walk-keyed self-join bounded
    * by walkLen·window pairs per walk + one pair-keyed count — both
    * map-side combinable, nothing quadratic in corpus size. Expects
    * (walk_id, walk) with space-joined tokens; returns
    * (center, context, n). */
  def skipGrams(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, "skipGrams needs window >= 1")
    val toks = walks.select(col("walk_id"),
      posexplode(split(col("walk"), " ")).as(Seq("pos", "tok")))
    val a = toks.select(col("walk_id"), col("pos").as("__pc"),
      col("tok").as("center"))
    val b = toks.select(col("walk_id").as("__w2"), col("pos").as("__px"),
      col("tok").as("context"))
    a.join(b, col("walk_id") === col("__w2") &&
        col("__pc") =!= col("__px") &&
        abs(col("__pc") - col("__px")) <= window)
      .groupBy("center", "context").agg(count(lit(1)).as("n"))
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003): score a
    * non-adjacent pair (x, y) by Σ_{z ∈ N(x)∩N(y)} 1/ln(deg z) — common
    * neighbors, inversely weighted by how promiscuous each one is. The
    * classic "who should be linked" readout over co-purchase /
    * co-authorship graphs; on a bipartite graph the candidates fall out
    * as same-side pairs automatically.
    *
    * Skew control — the part that decides 100 TB survival: raw wedge
    * enumeration is Σ deg(z)², so one celebrity center emits 10¹²
    * pairs. Two deterministic, engine-replayable bounds: (a) centers
    * above `maxCenterDeg` are DROPPED (their per-pair weight 1/ln(deg)
    * is the smallest in the graph, so they add the least signal per
    * unit of work — the standard cut); (b) optional pivot sampling à la
    * Brandes–Pich: only centers whose md5 hash ≡ 0 mod `sampleMod`
    * contribute (scores become a deterministic ~1/sampleMod-expectation
    * estimate). Wedge volume is then ≤ maxCenterDeg · m / sampleMod.
    *
    * Weights round at 12 dp into the decimal-exact sum regime; the
    * top-k order is (exact score desc, pair) — total, so both engines
    * cut the same k rows. Returns (node1, node2, common, aa). */
  def adamicAdar(edges: DataFrame, maxCenterDeg: Int, sampleMod: Int = 1,
                 topK: Int = 50, seed: Int = 7): DataFrame = {
    require(maxCenterDeg >= 2 && sampleMod >= 1 && topK >= 1,
      "adamicAdar needs maxCenterDeg >= 2, sampleMod >= 1, topK >= 1")
    val e = edges.select(col("src"), col("dst"))
    val ec = e.select(least(col("src"), col("dst")).as("n1"),
        greatest(col("src"), col("dst")).as("n2"))
      .where(col("n1") =!= col("n2")).distinct().localCheckpoint()
    val und = ec.select(col("n1").as("a"), col("n2").as("b"))
      .unionByName(ec.select(col("n2").as("a"), col("n1").as("b")))
    val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
    val ctr = deg.where(col("d") >= 2 && col("d") <= maxCenterDeg &&
      pmod(graft.functions.Text.md5Hash64(col("node").cast("string"), seed),
        lit(sampleMod)) === 0)
    val adj = und.join(ctr.select(col("node").as("a"), col("d")), "a")
      .select(col("a").as("z"), col("b").as("nbr"), col("d"))
    val x = adj.select(col("z"), col("nbr").as("n1"), col("d"))
    val y = adj.select(col("z").as("__z2"), col("nbr").as("n2"))
    val wedges = x.join(y, col("z") === col("__z2") && col("n1") < col("n2"))
    val sc = wedges.groupBy("n1", "n2")
      .agg(count(lit(1)).as("common"),
        sum(round(lit(1.0) / log(col("d").cast("double")), 12)
          .cast("decimal(28,12)")).cast("double").as("__aa"))
    sc.join(ec, Seq("n1", "n2"), "left_anti")
      .orderBy(col("__aa").desc, col("n1"), col("n2"))
      .limit(topK)
      .select(col("n1").as("node1"), col("n2").as("node2"), col("common"),
        round(col("__aa"), 9).as("aa"))
  }

  /** [[sssp]] with PER-SEED provenance — state keyed (seed, node), so
    * the output carries every seed's own distance field instead of the
    * min over seeds. This is the transport for sampled centrality
    * (Eppstein & Wang 2004: closeness from k sampled sources): k seeds
    * cost k× the state of one [[sssp]] run in the SAME number of
    * rounds — one relaxation round advances every seed's frontier at
    * once, so the round count is the max weighted-hop depth over seeds,
    * not the sum. Returns (seed, node, dist, iters); all-BIGINT, same
    * probed stop, same ungated-unroll oracle treatment (monotone in
    * every (seed, node) cell). */
  def ssspPerSeed(edges: DataFrame, isSource: Column => Column,
                  maxIter: Int = 30,
                  checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter >= 1, "ssspPerSeed needs maxIter >= 1")
    withDurable(edges, checkpointDir) { durable =>
    val e = cut(edges.select(col("src"), col("dst"),
      col("w").cast("long").as("w")), durable)
    val init = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .where(isSource(col("node")))
      .select(col("node").as("seed"), col("node"), lit(0L).as("dist"),
        lit(null).cast("long").as("__prev"))
    val (state, iters, _) = probeLoop(init, durable, 0.5, maxIter,
      s => ssspPerSeedRound(s, e),
      capDelta = st => st.agg(ssspCensus(st)).head().getDouble(0))
    state.select(col("seed"), col("node"), col("dist"),
      lit(iters).as("iters"))
    }
  }

  /** One per-seed relaxation round — [[ssspRound]] with the seed riding
    * the key: the join stays node==src (seeds fan out map-side), the
    * min-fold groups by (seed, node). */
  private[graft] def ssspPerSeedRound(state0: DataFrame, e: DataFrame)
      : DataFrame = {
    import graft.operators.Guards
    val state = state0.drop("__delta")
    val census = state.agg(ssspCensus(state).as("__delta"))
      .withColumn("__k", Guards.constKey(col("__delta")))
    // frontier-only relaxation — see [[ssspRound]] (same monotonicity
    // argument per (seed, node); state sequence bit-identical)
    val frontier = state.where(
      col("__prev").isNull || col("dist") < col("__prev"))
    val relax = shjHint(frontier).join(e, col("node") === col("src"))
      .select(col("seed"), col("dst").as("node"),
        (col("dist") + col("w")).as("dist"),
        lit(null).cast("long").as("__prevc"))
    state.select(col("seed"), col("node"), col("dist"),
        col("dist").as("__prevc"))
      .unionByName(relax)
      .groupBy("seed", "node")
      .agg(min("dist").as("dist"), min("__prevc").as("__prev"))
      .withColumn("__k", Guards.constKey(col("node")))
      .join(broadcast(census), "__k")
      .select(col("seed"), col("node"), col("dist"), col("__prev"),
        col("__delta"))
  }
}
