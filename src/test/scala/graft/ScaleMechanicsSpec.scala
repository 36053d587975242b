package graft

import graft.operators.Joins
import graft.sources.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The cluster-scale mechanics that local correctness tests don't exercise:
  * bucketed co-located joins, partition pruning at the scan, and salted
  * joins for skew. Each asserts on the PLAN (or plan + result), because
  * that's what changes at 1000 executors.
  */
class ScaleMechanicsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) under the default in-memory catalog
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      val o = Tables.orders(spark, "/root/testdata/sf0.001")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_b")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_b")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: no shuffle exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() ==
        li.join(o, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q99 bucketed catalog join: only the final aggregation shuffles") {
    val plan = Queries.all.find(_.name == "q99_bucketed_join").get
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"not a merge join:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllMatchIn(plan).length
    assert(shuffles <= 1,
      s"bucketed join sides shuffled ($shuffles exchanges):\n$plan")
  }

  test("partitioned parquet scans prune partitions at the source") {
    val dir = Files.createTempDirectory("graft_prune").toString
    val df = Seq((1, "2024-01", 1.0), (2, "2024-02", 2.0), (3, "2024-03", 3.0))
      .toDF("id", "month", "v")
    Sinks.writePartitioned(df, dir, Seq("month"))
    val q = spark.read.parquet(dir).where(col("month") === "2024-02")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(month"),
      s"no partition filter pushed:\n$scan")
    assert(q.count() == 1)
  }

  test("salted join equals the plain join result") {
    val fact = (1 to 500).map(i => (i % 3L, i.toLong)).toDF("k", "payload")
    val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).select("k", "payload", "label")
      .as[(Long, Long, String)].collect().toSet
    val salted = Joins.saltedJoin(fact, dim, Seq("k"),
        saltFrom = Seq(col("payload")), buckets = 8)
      .select("k", "payload", "label")
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
  }

  /** Shuffle-count canaries for the map-side-totals plans: the per-doc
    * totals in contamination and span dedup are computed BEFORE any
    * explode, so reintroducing a totals groupBy (a full-width shuffle of
    * every shingle/span) shows up as an extra Exchange. Counting
    * exchanges in the executed plan locks the shape in. */
  /** Shuffle (non-broadcast) exchange count of an executed plan. */
  private def shuffleExchanges(df: org.apache.spark.sql.DataFrame): Int =
    "(?m)^(?!.*BroadcastExchange).*Exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("contamination and span-dedup plans keep their exchange budget") {
    val sf = "/root/testdata/sf0.001"
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = shuffleExchanges(df)
    val cont = graft.operators.Corpus.contamination(
      Tables.documents(spark, sf), "doc_id", "text",
      col("doc_id") % 20 === 0, n = 8)
    // shingle-key join + hits aggregation exchanges only: the totals
    // branch adds NONE (map-only). Both plans measure exactly 3 shuffle
    // exchanges; a totals-groupBy regression pushes it to 4+.
    assert(exchanges(cont) <= 3,
      s"contamination plans ${exchanges(cont)} shuffle exchanges")
    val sd = graft.operators.Corpus.spanDedup(
      Tables.documents(spark, sf), "doc_id", "text", 8)
    assert(exchanges(sd) <= 3,
      s"spanDedup plans ${exchanges(sd)} shuffle exchanges")
  }

  test("round-6 additions keep their exchange budgets") {
    val sf = "/root/testdata/sf0.001"
    def check(name: String, q: Q, budget: Int): Unit = {
      val n = shuffleExchanges(q.run(spark, sf))
      assert(n <= budget, s"$name plans $n shuffle exchanges (budget $budget)")
    }
    // bottom-k sample: TakeOrdered + bounded window + one-row exact side
    check("q132", Queries.q132QuantileSketch, 2)
    // NB: train counts + pivot + one corpus token join + doc sums + matrix
    check("q133", Queries.q133NaiveBayes, 8)
    // TF-IDF: tf/cand/dot aggregations only — norms/idf ride broadcasts
    check("q135", Queries.q135TfidfCosine, 4)
    // funnel: per-step keyed join + min-agg, nothing stream-wide
    check("q136", Queries.q136Funnel, 7)
    // profiler: 1 scalar agg + 2 per distinct column (partial + single)
    check("q151", Queries.q151ProfileAudit, 16)
    // dup spans: shingle census + key join + per-doc islands — the
    // map-side n_tokens carry keeps the totals branch shuffle-free
    check("q156", Queries.q156DupSpans, 3)
    // JSD: slice/corpus term counts + vocab-keyed join + slice rollup;
    // totals ride broadcasts
    check("q157", Queries.q157JsDivergence, 7)
    // overlap audit: sketch build + exact distinct/count/intersection
    // verification frames (the audit side, absent in production use)
    check("q158", Queries.q158HllOverlap, 9)
    // z-order audit: tile groupBy + one-row rollup only
    check("q159", Queries.q159ZorderLayout, 2)
    // BPE encode: vocab distinct + word-keyed join + per-doc sums
    check("q160", Queries.q160BpeEncode, 2)
    // hybrid RRF: bm25's corpus aggregations plus ONE full-outer fuse
    // over the two ≤100-row truncated lists (ranks carried through the
    // fuse — re-joining them would re-run both retrieval arms)
    check("q161", Queries.q161HybridRrf, 8)
    // seasonal anomaly: one cell-stats groupBy + the final per-type
    // rollup; the stats frame broadcasts back (≤ |type·dow·hr| rows)
    check("q162", Queries.q162SeasonalAnomaly, 2)
    // bloom semi-join: the runtime filter itself is map-side; only the
    // reduced join + final aggregate shuffle
    check("q163", Queries.q163BloomSemijoin, 2)
    // ewma: the monthly rollup + per-key series collect; the smoothing
    // fold itself is a map-side array expression
    check("q164", Queries.q164Ewma, 2)
    // zipf fit: the vocab count is the only data-sized shuffle; the
    // head is a TakeOrdered + constKey window + one-row OLS rollup
    check("q166", Queries.q166ZipfFit, 1)
    // hybrid skew join: dim build + the cold-branch shuffle join + final
    // rollup — the hot branch is broadcast-only by design
    check("q167", Queries.q167SkewHybrid, 3)
    // incremental rollup: two batch builds; the merge+finish run over
    // state rows (map-side combine collapses them before the exchange)
    check("q168", Queries.q168IncrementalRollup, 2)
    // TWA: one keyed lead window + the per-user aggregate share the
    // user_id exchange
    check("q169", Queries.q169TimeWeighted, 1)
    // containment: df census + prefix-window exchanges only (candidate
    // and set-fetch joins reuse the checkpointed shingle partitioning)
    check("q170", Queries.q170Containment, 4)
    // trending: weekly rollup + the two keyed rank/lag windows
    check("q171", Queries.q171Trending, 3)
    // table diff: the one full-outer key join + status rollup
    check("q172", Queries.q172TableDiff, 3)
    // trailing uniques: daily sketch build + day-scale trailing join +
    // the exact-verification branch (absent in production use)
    check("q173", Queries.q173TrailingUniques, 6)
    // PMI: bigram + unigram counts and the two token-keyed dim joins;
    // totals ride one-row broadcasts, the cut is TakeOrdered
    check("q174", Queries.q174PmiCollocations, 7)
    // quantile drift: per-type + global percentile aggs; the gap math
    // is array expressions over broadcast rows
    check("q175", Queries.q175QuantileDrift, 2)
    // rendezvous audit: all scoring is expression work; one final agg
    check("q176", Queries.q176RendezvousShard, 1)
    // benford: digit census + a one-row total broadcast
    check("q177", Queries.q177BenfordAudit, 2)
    // source overlap: shingle distinct + the key-bounded pair join +
    // size dims; each shingle meets <= |sources| carriers
    check("q178", Queries.q178SourceOverlap, 7)
  }

  test("PQ encode/score plans are exchange-free single passes") {
    val sf = "/root/testdata/sf0.001"
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = shuffleExchanges(df)
    // q119: encode + ADC + top-k must stay scan -> project -> TakeOrdered
    val pq = Queries.q119PqAdc.run(spark, sf)
    assert(shuffles(pq) == 0,
      s"q119 plans ${shuffles(pq)} shuffle exchanges; the PQ pass must be map-only")
    // q120: the corpus-side IVF-PQ path is additionally join-free (the
    // centroid/codebook builds run as separate bounded jobs before it)
    val ivfpq = Queries.q120IvfPq.run(spark, sf)
    val plan = ivfpq.queryExecution.executedPlan.toString
    assert(shuffles(ivfpq) == 0,
      s"q120 plans ${shuffles(ivfpq)} shuffle exchanges")
    assert(!plan.contains("Join"), "q120's corpus-side plan must be join-free")
  }
}
