package graft

import graft.graph.Graph
import graft.sources.{Scratch, Sinks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Proves the cluster plan the graph family's comments claim (VERDICT r06
  * item 1): with the edge set written ONCE as a bucketed table on the join
  * key, every per-round state⋈edges join plans with ZERO exchanges on the
  * edge side — the per-round edge movement that dominates a 1000-executor
  * PageRank disappears into a one-time layout. Locked three ways:
  *  - plan: the round's join reads the bucketed scan with no shuffle
  *    between scan and join (and the same round over a plain parquet dir
  *    DOES shuffle the edge side — the contrast that keeps the canary
  *    honest);
  *  - result: the bucketed/prepared path hashes identically to the
  *    default distinct+checkpoint path;
  *  - durability: reliable `checkpoint(dir)` state (the fault-tolerant
  *    cluster option) hashes identically to `localCheckpoint` state.
  */
class GraphClusterPlanSpec extends SparkSpec {
  import spark.implicits._

  /** A graph with fan-in, fan-out, a cycle and a sink — every PageRank
    * code path (contributions, dangling mass) is live. */
  private def rawEdges: DataFrame =
    (1 to 400).flatMap { i =>
      Seq((s"n${i % 40}", s"n${(i * 7) % 40}"),
        (s"n${i % 40}", "sink"),
        (s"n${(i * 3) % 17}", s"n${i % 40}"))
    }.toDF("src", "dst")

  private def collectPlan(p: SparkPlan): Seq[SparkPlan] = p.collect { case x => x }

  private def bucketedScans(p: SparkPlan): Seq[FileSourceScanExec] =
    collectPlan(p).collect { case f: FileSourceScanExec if f.bucketedScan => f }

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    collectPlan(p).collect { case s: ShuffleExchangeExec => s }

  /** The children of shuffle joins that hold a bucketed scan DIRECTLY —
    * no other join or aggregate in between. (A downstream join's child can
    * contain the scan deep inside an already-aggregated subtree; that is
    * not the edge side of the state⋈edges round join.) */
  private def edgeSides(p: SparkPlan): Seq[SparkPlan] =
    collectPlan(p).collect {
      case j: SortMergeJoinExec => j.children
      case j: ShuffledHashJoinExec => j.children
    }.flatten.filter { c =>
      bucketedScans(c).nonEmpty && !collectPlan(c).exists {
        case _: SortMergeJoinExec | _: ShuffledHashJoinExec => true
        case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
        case _ => false
      }
    }

  /** Run `body` with AQE + auto-broadcast off so the static plan shows the
    * exchange structure a cluster pays. */
  private def withPlanConf[T](body: => T): T = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  private def ranksOf(df: DataFrame): Map[String, Double] =
    df.select(col("node"), col("rank")).as[(String, Double)].collect().toMap

  test("pageRank round over a src-bucketed edge table: zero edge-side exchanges") {
    val e = rawEdges.distinct()
    Sinks.writeBucketed(e, "gcp_edges_src", 4, "src")
    try withPlanConf {
      val bucketed = spark.table("gcp_edges_src").select(col("src"), col("dst"))
      val state = Graph.prInit(bucketed).localCheckpoint()
      val round = Graph.prRound(state, bucketed, 0.85, 0.15)
      val plan = round.queryExecution.executedPlan
      val sides = edgeSides(plan)
      assert(sides.nonEmpty, s"no shuffle join reads the bucketed scan:\n$plan")
      sides.foreach { side =>
        assert(shuffles(side).isEmpty,
          s"edge side of the round join still shuffles:\n$side")
      }
      // contrast: the same round over a PLAIN parquet dir must shuffle the
      // edge side — otherwise the assertion above proves nothing
      val plainDir = Scratch.dir("gcp_edges_plain")
      e.write.mode("overwrite").parquet(plainDir)
      val plain = spark.read.parquet(plainDir).select(col("src"), col("dst"))
      val plainPlan = Graph.prRound(Graph.prInit(plain).localCheckpoint(),
        plain, 0.85, 0.15).queryExecution.executedPlan
      val plainJoinSides = collectPlan(plainPlan).collect {
        case j: SortMergeJoinExec => j.children
        case j: ShuffledHashJoinExec => j.children
      }.flatten.filter(c => collectPlan(c).exists {
        case f: FileSourceScanExec => true; case _ => false
      })
      assert(plainJoinSides.exists(shuffles(_).nonEmpty),
        s"plain-parquet round did not shuffle the edge side — contrast lost:\n$plainPlan")
    } finally spark.sql("DROP TABLE IF EXISTS gcp_edges_src")
  }

  test("hits half-steps over src-/dst-bucketed edge copies: zero edge-side exchanges") {
    val e = rawEdges.distinct()
    Sinks.writeBucketed(e, "gcp_edges_src2", 4, "src")
    Sinks.writeBucketed(e, "gcp_edges_dst2", 4, "dst")
    try withPlanConf {
      val eSrc = spark.table("gcp_edges_src2").select(col("src"), col("dst"))
      val eDst = spark.table("gcp_edges_dst2").select(col("src"), col("dst"))
      val state = Graph.hits(eSrc, iterations = 1, edgesPrepared = true,
        edgesByDst = Some(eDst))
      // per-half-step plans, pre-checkpoint (the result's own plan is a
      // post-checkpoint RDD scan and shows nothing)
      val s0 = state.select(col("node"), col("hub"), col("auth")).localCheckpoint()
      Seq(Graph.hitsAuthStep(s0, eSrc), Graph.hitsHubStep(s0, eDst)).foreach { half =>
        val plan = half.queryExecution.executedPlan
        val sides = edgeSides(plan)
        assert(sides.nonEmpty, s"no shuffle join reads a bucketed scan:\n$plan")
        sides.foreach(side => assert(shuffles(side).isEmpty,
          s"edge side of a HITS half-step still shuffles:\n$side"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcp_edges_src2")
      spark.sql("DROP TABLE IF EXISTS gcp_edges_dst2")
    }
  }

  test("betweenness phases over src-/dst-bucketed edges: zero edge-side exchanges + parity") {
    val e = rawEdges.distinct()
    Sinks.writeBucketed(e, "gcp_edges_bw_src", 4, "src")
    Sinks.writeBucketed(e, "gcp_edges_bw_dst", 4, "dst")
    try {
      val eSrc = spark.table("gcp_edges_bw_src").select(col("src"), col("dst"))
      val eDst = spark.table("gcp_edges_bw_dst").select(col("src"), col("dst"))
      withPlanConf {
        // forward round: frontier⋈edges on src reads the bucketed scan
        // shuffle-free; backward level: contrib⋈edges on dst likewise
        val settled = eSrc.select(col("src").as("seed"), col("src").as("node"),
            lit(0).as("hop"), lit(1L).as("sigma")).distinct().localCheckpoint()
        val fwd = Graph.betwForwardRound(settled, eSrc, 0)
        val bwd = Graph.betwBackwardLevelFrames(settled,
          settled.withColumn("delta", lit(0.0)), eDst)
        Seq("forward" -> fwd, "backward" -> bwd).foreach { case (nm, df) =>
          val plan = df.queryExecution.executedPlan
          val sides = edgeSides(plan)
          assert(sides.nonEmpty, s"$nm: no shuffle join reads a bucketed scan:\n$plan")
          sides.foreach(side => assert(shuffles(side).isEmpty,
            s"$nm: edge side of the round join still shuffles:\n$side"))
        }
      }
      // result parity: prepared dual-bucketed path == default path
      def bw(df: DataFrame, prepared: Boolean, byDst: Option[DataFrame]) =
        Graph.betweennessSampled(df, _ => lit(true), maxHops = 4,
            edgesPrepared = prepared, edgesByDst = byDst)
          .as[(String, Double)].collect().toMap
      assert(bw(eSrc, prepared = true, Some(eDst)) ===
        bw(rawEdges, prepared = false, None),
        "bucketed betweenness diverged from the default path")
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcp_edges_bw_src")
      spark.sql("DROP TABLE IF EXISTS gcp_edges_bw_dst")
    }
  }

  test("bucketed/prepared pageRank hashes identically to the default path") {
    val e = rawEdges
    Sinks.writeBucketed(e.distinct(), "gcp_edges_par", 4, "src")
    try {
      val default = ranksOf(Graph.pageRank(e, iterations = 5))
      val prepared = ranksOf(Graph.pageRank(spark.table("gcp_edges_par"),
        iterations = 5, edgesPrepared = true))
      assert(prepared == default, "bucketed-edge path diverged from default")
    } finally spark.sql("DROP TABLE IF EXISTS gcp_edges_par")
  }

  test("pageRankConverged over a src-bucketed edge table: zero edge-side exchanges + parity") {
    // the actual cluster deployment shape (r08 verdict item 3): the
    // data-dependent stop COMPOSED with the one-time bucketed layout —
    // the probed round's plan must stay edge-exchange-free exactly like
    // the fixed-round round, and the converged result must hash-match
    // the default distinct+checkpoint path bit-for-bit
    val e = rawEdges.distinct()
    Sinks.writeBucketed(e, "gcp_edges_conv", 4, "src")
    try {
      val bucketed = spark.table("gcp_edges_conv")
        .select(col("src"), col("dst"))
      withPlanConf {
        // the converged transport's per-round plan is prRound with
        // trackDelta = true (the delta rides the dangling broadcast) —
        // assert THAT plan, not the plain round's
        val state = Graph.prInit(bucketed)
          .withColumn("__prev", lit(null).cast("double")).localCheckpoint()
        val round = Graph.prRound(state, bucketed, 0.85, 0.15,
          trackDelta = true)
        val plan = round.queryExecution.executedPlan
        val sides = edgeSides(plan)
        assert(sides.nonEmpty,
          s"no shuffle join reads the bucketed scan:\n$plan")
        sides.foreach(side => assert(shuffles(side).isEmpty,
          s"edge side of the converged round join still shuffles:\n$side"))
      }
      val default = Graph.pageRankConverged(rawEdges, tol = 1e-6,
          maxIter = 60)
        .select(col("node"), col("rank"), col("iters"), col("l1_delta"))
        .as[(String, Double, Int, Double)].collect().toSet
      val prepared = Graph.pageRankConverged(bucketed, tol = 1e-6,
          maxIter = 60, edgesPrepared = true)
        .select(col("node"), col("rank"), col("iters"), col("l1_delta"))
        .as[(String, Double, Int, Double)].collect().toSet
      assert(prepared == default,
        "converged-over-buckets diverged from the default converged path")
    } finally spark.sql("DROP TABLE IF EXISTS gcp_edges_conv")
  }

  test("durable checkpoint path hashes identically to localCheckpoint (pageRank + hits)") {
    val dir = Scratch.dir("gcp_ckpt")
    val e = rawEdges
    val local = ranksOf(Graph.pageRank(e, iterations = 4))
    val durable = ranksOf(Graph.pageRank(e, iterations = 4,
      checkpointDir = Some(dir)))
    assert(durable == local, "reliable-checkpoint pageRank diverged")
    def hitsMap(df: DataFrame): Map[String, (Double, Double)] =
      df.select(col("node"), col("hub"), col("auth"))
        .as[(String, Double, Double)].collect()
        .map { case (n, h, a) => n -> (h, a) }.toMap
    val hLocal = hitsMap(Graph.hits(e, iterations = 2))
    val hDurable = hitsMap(Graph.hits(e, iterations = 2,
      checkpointDir = Some(dir)))
    assert(hDurable == hLocal, "reliable-checkpoint hits diverged")
    // betweenness exercises the level-frame retention hole the r09 form
    // had: with deepest >= 3 the final union re-reads EVERY level frame
    // and settled slice AFTER later checkpoints — tracked keep-2
    // retention deleted them on the durable path (r10 advice item 1).
    // rawEdges at maxHops = 5 settles 4+ hop levels, so this run fails
    // with deleted-checkpoint reads if level frames are ever tracked.
    def bwMap(df: DataFrame): Map[String, Double] =
      df.as[(String, Double)].collect().toMap
    val bwLocal = bwMap(Graph.betweennessSampled(e,
      n => n.isin("n1", "n5", "n11"), maxHops = 5))
    val bwDurable = bwMap(Graph.betweennessSampled(e,
      n => n.isin("n1", "n5", "n11"), maxHops = 5,
      checkpointDir = Some(dir)))
    assert(bwDurable == bwLocal, "reliable-checkpoint betweenness diverged")
  }

  test("pageRankConverged stops at the tolerance and matches the fixed-round twin") {
    val e = rawEdges
    val conv = Graph.pageRankConverged(e, tol = 1e-6, maxIter = 60)
    val rows = conv.select(col("node"), col("rank"), col("iters"), col("l1_delta"))
      .as[(String, Double, Int, Double)].collect()
    val iters = rows.head._3
    val delta = rows.head._4
    assert(rows.forall(r => r._3 == iters && r._4 == delta))
    assert(delta < 1e-6, s"stopped with l1_delta=$delta >= tol")
    assert(iters < 60, "hit maxIter instead of converging")
    // after k rounds the recurrence is identical to pageRank(e, k)
    val fixed = ranksOf(Graph.pageRank(e, iterations = iters))
    assert(rows.map(r => r._1 -> r._2).toMap == fixed,
      "converged ranks diverge from the fixed-round recurrence at the same k")
    // fixed point: one more round moves the state by less than tol again
    val oneMore = ranksOf(Graph.pageRank(e, iterations = iters + 1))
    val l1 = fixed.map { case (n, r) => math.abs(oneMore(n) - r) }.sum
    assert(l1 < 1e-6, s"one extra round moved L1 by $l1 — not a fixed point")
  }

  test("durable retention keeps O(1) round states and restores the checkpoint dir") {
    val sc = spark.sparkContext
    val before = sc.getCheckpointDir
    val dir = Scratch.dir("gcp_retention")
    val local = ranksOf(Graph.pageRank(rawEdges, iterations = 8))
    val durable = ranksOf(Graph.pageRank(rawEdges, iterations = 8,
      checkpointDir = Some(dir)))
    assert(durable == local, "retention-pruned durable run changed results")
    // the per-operator override must not leak into the session
    assert(sc.getCheckpointDir == before,
      s"checkpoint dir leaked: ${sc.getCheckpointDir} (was $before)")
    // 8 rounds + init wrote 9 state checkpoints + 1 edge checkpoint;
    // retention must have pruned superseded state down to O(1):
    // <= 2 kept states + the never-pruned edge set
    val uuidDirs = new java.io.File(dir).listFiles()
    assert(uuidDirs != null && uuidDirs.length == 1,
      s"expected one UUID subdir under $dir")
    val rdds = uuidDirs.head.listFiles().filter(_.getName.startsWith("rdd-"))
    assert(rdds.length <= 3,
      s"retention failed: ${rdds.length} rdd-* checkpoints remain " +
        rdds.map(_.getName).mkString("[", ",", "]"))
  }

  test("hitsConverged stops at the tolerance and matches the fixed-round twin") {
    val e = rawEdges
    val conv = Graph.hitsConverged(e, tol = 1e-6, maxIter = 40)
    val rows = conv.select(col("node"), col("hub"), col("auth"),
        col("iters"), col("l1_delta"))
      .as[(String, Double, Double, Int, Double)].collect()
    val iters = rows.head._4
    val delta = rows.head._5
    assert(rows.forall(r => r._4 == iters && r._5 == delta))
    assert(delta < 1e-6, s"stopped with l1_delta=$delta >= tol")
    assert(iters < 40, "hit maxIter instead of converging")
    val fixed = Graph.hits(e, iterations = iters)
      .select(col("node"), col("hub"), col("auth"))
      .as[(String, Double, Double)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap
    assert(rows.map(r => r._1 -> (r._2, r._3)).toMap == fixed,
      "converged HITS diverges from the fixed-round recurrence at the same k")
  }

  test("personalizedPageRankConverged matches the fixed-round twin at its stop") {
    val e = rawEdges
    val isSeed = (node: org.apache.spark.sql.Column) =>
      node.isin("n1", "n7", "n13")
    val conv = Graph.personalizedPageRankConverged(e, isSeed,
      tol = 1e-6, maxIter = 60)
    val rows = conv.select(col("node"), col("rank"), col("iters"), col("l1_delta"))
      .as[(String, Double, Int, Double)].collect()
    val iters = rows.head._3
    assert(rows.head._4 < 1e-6 && iters < 60)
    val fixed = ranksOf(Graph.personalizedPageRank(e, isSeed, iterations = iters))
    assert(rows.map(r => r._1 -> r._2).toMap == fixed,
      "converged PPR diverges from the fixed-round recurrence at the same k")
  }

  test("label propagation finds disjoint communities and stops at zero change") {
    // two disjoint triangles + an isolated pair: three communities, each
    // labeled by its minimal member (self-vote LPA's converged labeling)
    val e = Seq(("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
        ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
        ("c1", "c2"))
      .toDF("src", "dst")
    val rows = Graph.labelPropagationConverged(e, maxIter = 10)
      .as[(String, String, Int, Long)].collect()
    val byNode = rows.map(r => r._1 -> r._2).toMap
    assert(byNode == Map(
      "a1" -> "a1", "a2" -> "a1", "a3" -> "a1",
      "b1" -> "b1", "b2" -> "b1", "b3" -> "b1",
      "c1" -> "c1", "c2" -> "c1"))
    assert(rows.forall(_._4 == 0L), "stop must report zero changes")
    assert(rows.head._3 < 10, "hit maxIter instead of converging")
    // direction must not matter: reversed edges, same communities
    val rev = Graph.labelPropagationConverged(
        e.select(col("dst").as("src"), col("src").as("dst")), maxIter = 10)
      .as[(String, String, Int, Long)].collect()
    assert(rev.map(r => r._1 -> r._2).toMap == byNode)
  }
}
