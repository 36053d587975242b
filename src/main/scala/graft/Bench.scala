package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is forced
  * through the `noop` sink — a bare count() would let Catalyst prune the
  * expensive projections and fake the numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // object-typed aggregates (graft_bottomk, graft_simhash) keep tiny
      // ≤8k-byte buffers per group; the default 128-key fallback turns
      // every such aggregation sort-based and spills the exploded input
      // (q202 spilled a constant 5.9 GB/iteration from exactly this)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // task-level telemetry (r07 verdict item 4): per-iteration GC time
    // and shuffle/agg spill, so a noisy steady sample is attributable
    // from the artifact (q61 at 157 s single-shot vs 6.4 s steady was
    // VM contention — but nothing in BENCH_r07 could prove it). The
    // listener bus is async; `drain()` flushes it before each
    // counter snapshot (bytecode-public waitUntilEmpty via reflection —
    // best-effort, a timeout just blurs one sample's attribution).
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val spillBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            gcMs.addAndGet(m.jvmGCTime): Unit
            spillBytes.addAndGet(
              m.memoryBytesSpilled + m.diskBytesSpilled): Unit
          }
        }
      })
    def drain(): Unit = try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus): Unit
    } catch { case _: Throwable => () }
    // session warmup: JVM/codegen init and cold file-listing/footer reads
    // shouldn't be billed to whichever query happens to run first
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try {
        val df = if (t == "events") Tables.events(spark, sfDir)
          else Tables.table(spark, sfDir, t)
        df.count()
      } catch { case _: Throwable => () }
    }

    // prior-round per-query seconds, parsed from the committed
    // BENCH_DETAIL.json BEFORE this run overwrites it — the 5x-regression
    // trigger for the steady-state net below. Number-valued pairs only:
    // the steady_state arrays (`"name":[...]`) don't match the regex.
    val prior: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BENCH_DETAIL.json")), "UTF-8")
        val all = "\"(q[0-9]+_[a-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
        // a failed query's recorded time is time-to-exception, not a
        // runtime — using it as the 5x baseline would trip the trigger
        // on every healthy successor run
        val priorFailed = "\"failed\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse("")
          .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSet
        all.view.filterKeys(k => !priorFailed.contains(k)).toMap
      } catch { case _: Throwable => Map.empty }

    // local-iteration subset filter (comma-separated name substrings);
    // the driver never sets it, so its runs always cover the catalog
    // empty substrings dropped and a set-but-empty var treated as unset:
    // SPARK_GRAFT_ONLY="" runs the full catalog and must also WRITE the
    // full-run detail below, not discard it as a subset run
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).filter(_.nonEmpty)
    // failures must be LOUD in the summary: round 4's bench swallowed a
    // q46 exception into stderr and the JSON still read as a clean run
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = Queries.all
      .filter(q => only.forall(_.exists(q.name.contains))).map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        failed += q.name
        System.err.println(s"[bench] ${q.name} FAILED:")
        e.printStackTrace()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // iterative operators (BFS, label propagation) cache intermediates
      // the caller can never unpersist; 86 queries of leaked cache blocks
      // degrade every later query (measured: q67 at 19s in the full run
      // vs 1.8s standalone). Clearing between queries bills each query
      // its own cost — the clear itself is outside the timed window.
      spark.catalog.clearCache()
      q.name -> dt
    }
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // the harness keeps only the LAST 2000 chars of stdout, so the JSON
    // line must fit that window or its opening brace gets clipped and the
    // whole run parses as null (rounds 1-2 did). Short keys (q01 not
    // q01_ruleagg_basic) + 3-decimal seconds keep ~140 queries under the
    // limit; the full-name map goes to BENCH_DETAIL.json alongside.
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + r3(v)
    }.mkString("{", ",", "}")
    // total/mean cover COMPLETED queries only: a failed query's
    // time-to-exception is not a runtime, and mixing it in skews the
    // aggregates exactly when they matter most (r05 advice item)
    val completed = results.filterNot { case (k, _) => failed.contains(k) }
    val total = completed.map(_._2).sum
    // n_queries/mean give cross-round comparability: the catalog grows
    // every round, so raw total seconds alone would read as a regression
    val mean = if (completed.nonEmpty) total / completed.size else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // steady-state evidence for the hottest queries: the single-shot
    // numbers above vary ±40% on this VM (and the round-4 driver run was
    // 10-20x contention-polluted on a handful) — three further
    // iterations per top-10 query, recorded next to the single shots,
    // let a reader separate a real regression from a noisy shot without
    // a separate adjudication run
    // net (r05 verdict item 6): top-10 by single shot PLUS every query
    // whose single shot exceeds 10 s or 5x its prior-round time — the
    // r05 top-10 missed q112/q119/q64, which were slow but not top-10
    val hot = (completed.sortBy(-_._2).take(10).map(_._1) ++
      completed.collect { case (k, v)
        if v > 10.0 || prior.get(k).exists(p => v > 5 * p) => k }).toSet
    val steadyFailed = scala.collection.mutable.ArrayBuffer.empty[String]
    // steady entries carry times PLUS the per-iteration GC-time and
    // spill attribution: {"t":[s,s,s],"gc_ms":[..],"spill_mb":[..]} —
    // a 3x-outlier iteration with flat gc/spill is external contention,
    // one with a gc or spill spike is the query's own memory story
    val steadyTimes = scala.collection.mutable.Map.empty[String, Seq[Double]]
    val steady = Queries.all.filter(q => hot.contains(q.name)).map { q =>
      val samples = (1 to 3).map { _ =>
        drain()
        val (g0, s0) = (gcMs.get(), spillBytes.get())
        val t0 = System.nanoTime()
        // loud AND in the artifact, like the single-shot loop: a failed
        // iteration must not masquerade as a fast steady sample
        try q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          if (!steadyFailed.contains(q.name)) steadyFailed += q.name
          System.err.println(s"[bench] steady-state ${q.name} FAILED: $e")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        drain()
        (dt, gcMs.get() - g0, (spillBytes.get() - s0) / 1048576.0)
      }
      spark.catalog.clearCache()
      steadyTimes(q.name) = samples.map(_._1)
      "\"" + q.name + "\":{\"t\":[" + samples.map(s => r3(s._1)).mkString(",") +
        "],\"gc_ms\":[" + samples.map(_._2.toString).mkString(",") +
        "],\"spill_mb\":[" + samples.map(s => "%.1f".formatLocal(
          java.util.Locale.ROOT, s._3)).mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val steadyFailedJson =
      steadyFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // steady-median headline next to the single shot (r07 verdict: the
    // r07 single-shot total read as a 2x regression that was ~350 s of
    // VM contention) — per query, the median of its steady samples when
    // it was re-run, its single shot otherwise
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val totalSteady = completed.map { case (k, v) =>
      steadyTimes.get(k).filterNot(_ => steadyFailed.contains(k))
        .map(median).getOrElse(v)
    }.sum
    // sf1 scale probe (r07 verdict item 8): the first measured evidence
    // above the driver's sf0.1 — the heaviest iterative chain (bucketed
    // PageRank, the q179 path) at 10x the edge volume. Edges are 10
    // key-shifted copies of the customer->supplier graph on the CUSTOMER
    // side over the same suppliers: suppliers are the bounded dim, so
    // this preserves (and deepens) the supplier-hub skew the ranker's
    // dst-aggregation must survive, instead of cloning 10 disjoint
    // graphs whose rounds never interact. The one-time bucketed layout
    // is timed separately (setup_sec) from the 3 steady ranker
    // iterations — the q112/q179 setup-vs-steady discipline. Skippable
    // for local iteration via SPARK_GRAFT_SF1=0.
    val sf1Json =
      if (only.nonEmpty || sys.env.get("SPARK_GRAFT_SF1").contains("0")) "{}"
      else try {
        import org.apache.spark.sql.functions._
        val copies = 10
        val t0 = System.nanoTime()
        val edges = Tables.table(spark, sfDir, "orders")
          .join(Tables.table(spark, sfDir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("l_suppkey")).distinct()
          .select(explode(sequence(lit(0), lit(copies - 1))).as("copy"),
            col("o_custkey"), col("l_suppkey"))
          .select(concat(lit("c"), col("copy"), lit("_"), col("o_custkey"))
            .as("src"), concat(lit("s"), col("l_suppkey")).as("dst"))
        graft.sources.Sinks.writeBucketed(edges, "bench_sf1_edges", 32, "src")
        val edgeRows = spark.table("bench_sf1_edges").count()
        val setupSec = (System.nanoTime() - t0) / 1e9
        val samples = (1 to 3).map { _ =>
          drain()
          val (g0, s0) = (gcMs.get(), spillBytes.get())
          val it0 = System.nanoTime()
          graft.graph.Graph
            .pageRank(spark.table("bench_sf1_edges"), iterations = 6,
              edgesPrepared = true)
            .write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - it0) / 1e9
          drain()
          (dt, gcMs.get() - g0, (spillBytes.get() - s0) / 1048576.0)
        }
        spark.catalog.clearCache()
        // merge probe: the footprint-boundedness claim made measurable —
        // a month-bounded changeset merged into the 10x base table must
        // cost the touched partition's share, not the table's. 10
        // key-shifted copies of orders partitioned by (year*100+month):
        // 84 month partitions, changeset = every copy's 1997-03 key%7
        // price restatement (pure upsert, one partition), re-applied
        // idempotently per iteration.
        val mergeBase = graft.sources.Scratch.dir("bench_sf1_merge")
        val m0 = System.nanoTime()
        val orders10 = Tables.table(spark, sfDir, "orders")
          .select(explode(sequence(lit(0), lit(copies - 1))).as("copy"),
            col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
          .select((col("o_orderkey") * copies + col("copy")).as("o_orderkey"),
            col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
            col("o_orderdate"), col("o_orderpriority"))
          .withColumn("o_ym",
            year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        graft.sources.Sinks.writePartitioned(orders10, mergeBase, Seq("o_ym"))
        val nParts = graft.sources.Sinks
          .partitionFileStats(mergeBase, Seq("o_ym")).size
        val mergeSetup = (System.nanoTime() - m0) / 1e9
        // materialized once: a lazy plan would re-derive the changeset
        // from the post-merge table and compound the 1.1x per iteration
        val changes = spark.read.parquet(mergeBase)
          .where(col("o_ym") === 199703 && col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", round(col("o_totalprice") * 1.1, 2))
          .withColumn("del", lit(false))
          .localCheckpoint()
        val mSamples = (1 to 3).map { _ =>
          drain()
          val (g0, s0) = (gcMs.get(), spillBytes.get())
          val it0 = System.nanoTime()
          graft.sources.Sinks.mergeIntoPartitioned(mergeBase, changes,
            Seq("o_orderkey"), Seq("o_ym"), deleteCol = Some("del"))
          val dt = (System.nanoTime() - it0) / 1e9
          drain()
          (dt, gcMs.get() - g0, (spillBytes.get() - s0) / 1048576.0)
        }
        spark.catalog.clearCache()
        // dedup probe: the training-pipeline headline chain (MinHash-LSH
        // pairs -> connected components -> anti-join sweep, the q86
        // composition) over a corpus where 90% of documents are exact
        // copies — the crawl-shaped duplication near-dedup exists for.
        // 10 id-remapped copies of documents, written to parquet so the
        // steady iterations scan real files; identical copies land every
        // clique in the same LSH buckets in every band, so candidate
        // generation carries ~100x the 1x pair volume through the
        // banded equi-join (bucket membership x10 => pairs x100) and the
        // component rounds collapse 10-deep cliques — the stress is the
        // candidate generator and the iterative contraction, exactly the
        // two stages that decide whether the sweep survives a real
        // corpus. Setup (the 10x write) is timed apart, q112-style.
        val dedupBase = graft.sources.Scratch.dir("bench_sf1_docs")
        val d0 = System.nanoTime()
        val docs10 = Tables.table(spark, sfDir, "documents")
          .select(explode(sequence(lit(0), lit(copies - 1))).as("copy"),
            col("doc_id"), col("text"), col("source"), col("n_chars"))
          .select((col("doc_id") * copies + col("copy")).as("doc_id"),
            col("text"), col("source"), col("n_chars"))
        docs10.write.mode("overwrite").parquet(dedupBase)
        val docRows = spark.read.parquet(dedupBase).count()
        val dedupSetup = (System.nanoTime() - d0) / 1e9
        val dSamples = (1 to 3).map { _ =>
          drain()
          val (g0, s0) = (gcMs.get(), spillBytes.get())
          val it0 = System.nanoTime()
          val corpus = spark.read.parquet(dedupBase)
          val pairs = graft.operators.Dedup.minHashLshPairs(corpus,
            "doc_id", "text", n = 3, numHashes = 32, numBands = 8,
            threshold = 0.5)
          val drop = graft.operators.Dedup.connectedComponents(pairs)
            .where(col("id") =!= col("component"))
            .select(col("id").as("doc_id"))
          corpus.join(drop, Seq("doc_id"), "left_anti")
            .groupBy("source")
            .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
            .write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - it0) / 1e9
          drain()
          (dt, gcMs.get() - g0, (spillBytes.get() - s0) / 1048576.0)
        }
        spark.catalog.clearCache()
        // perceptual-dedup probe: aHash signatures + banding + hamming
        // verify (q215's op) over the SAME 10x corpus — identical copies
        // share signatures exactly, so every copy-clique collides in all
        // four bands and the verify stage carries ~100x the 1x pair
        // volume, while the signature stage stresses the expression-only
        // byte pipeline (hex + 64 substr/conv reads per blob). The claim
        // under test: both stages stay candidate-bounded at 10x.
        val aSamples = (1 to 3).map { _ =>
          drain()
          val (g0, s0) = (gcMs.get(), spillBytes.get())
          val it0 = System.nanoTime()
          graft.multimodal.Binary.aHashPairs(
              spark.read.parquet(dedupBase)
                .withColumn("bytes", encode(col("text"), "UTF-8")),
              "doc_id", "bytes", maxHamming = 6)
            .write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - it0) / 1e9
          drain()
          (dt, gcMs.get() - g0, (spillBytes.get() - s0) / 1048576.0)
        }
        spark.catalog.clearCache()
        // gradient-tier probe: full-batch logistic-regression training
        // (q197's op) over the SAME 10x corpus the dedup probe staged —
        // 8 GD rounds, each one corpus pass partial-aggregated to a
        // single row. The claim under test: per-round cost is the scan,
        // the model never shuffles, so 10x data = ~10x scan time and
        // nothing else grows.
        val lSamples = (1 to 3).map { _ =>
          drain()
          val (g0, s0) = (gcMs.get(), spillBytes.get())
          val it0 = System.nanoTime()
          val feats = Queries.logregFeaturesOf(spark.read.parquet(dedupBase))
            .localCheckpoint()
          graft.operators.LogReg.train(feats,
            Seq("x1", "x2", "x3", "x4", "x5"), "y", rounds = 8, lr = 0.5)
          val dt = (System.nanoTime() - it0) / 1e9
          drain()
          (dt, gcMs.get() - g0, (spillBytes.get() - s0) / 1048576.0)
        }
        spark.catalog.clearCache()
        def entryJson(name: String, ss: Seq[(Double, Long, Double)],
            extra: String): String =
          "\"" + name + "\":{\"t\":[" + ss.map(s => r3(s._1)).mkString(",") +
            "],\"gc_ms\":[" + ss.map(_._2.toString).mkString(",") +
            "],\"spill_mb\":[" + ss.map(s => "%.1f".formatLocal(
              java.util.Locale.ROOT, s._3)).mkString(",") + "]," + extra + "}"
        "{" + entryJson("q179_pagerank_bucketed_10x", samples,
            s"""\"setup_sec\":${r3(setupSec)},\"edge_rows\":$edgeRows,\"copies\":$copies""") +
          "," + entryJson("q187_merge_upsert_10x", mSamples,
            s"""\"setup_sec\":${r3(mergeSetup)},\"n_partitions\":$nParts,\"touched_partitions\":1""") +
          "," + entryJson("q86_dedup_sweep_10x", dSamples,
            s"""\"setup_sec\":${r3(dedupSetup)},\"doc_rows\":$docRows,\"copies\":$copies""") +
          "," + entryJson("q215_ahash_dedup_10x", aSamples,
            s"""\"doc_rows\":$docRows,\"copies\":$copies""") +
          "," + entryJson("q197_logreg_10x", lSamples,
            s"""\"doc_rows\":$docRows,\"rounds\":8""") +
          "}"
      } catch { case e: Throwable =>
        System.err.println(s"[bench] sf1 probe FAILED: $e")
        "{\"failed\":true}"
      }
    val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","total_steady":${r3(totalSteady)},"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"mean_per_query":${r3(mean)},"queries":$qs,"sf1_10x":$sf1Json,"sf":"$sfDir"}"""
    val detail = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{\"queries\":{", ",",
        s"},\"total\":${r3(total)},\"total_steady\":${r3(totalSteady)},\"n_failed\":${failed.size},\"failed\":$failedJson,\"steady_state\":$steady,\"steady_failed\":$steadyFailedJson,\"sf1_10x\":$sf1Json,\"sf\":\"$sfDir\"}")
    // subset runs (SPARK_GRAFT_ONLY) are local iteration: writing their
    // handful of queries over BENCH_DETAIL.json would hollow out the
    // next full run's prior baseline (and the committed artifact)
    if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
        detail.getBytes("UTF-8"))
    else
      // subset runs are local iteration: surface the steady arrays (gc /
      // spill attribution included) on stderr instead of silently
      // discarding them with the detail file
      System.err.println(s"[bench] steady detail: $steady")
    println(line)
    spark.stop()
  }
}
