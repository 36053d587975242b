package graft

/** Plan-quality canaries: catch scale regressions at test time, before any
  * bench run. A CartesianProduct sneaking into a catalog query, or the
  * central join losing its broadcast, is a 100 TB incident — fail fast.
  */
class PlanQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose plans legitimately contain a nested-loop join: bounded
    * inequality self-joins (pair generation on a filtered subset) and the
    * grid-NN brute fallback over the unresolved remainder. */
  private val nestedLoopAllowed = Set(
    // brute-force baselines and the grid-NN fallback: bounded by probe count
    "q26_knn_bruteforce", "q36_grid_nn",
    // RP-ANN: corpus x broadcast PROBES (10 rows) scan — the projected
    // candidate pass is the brute shape with 8-dim arithmetic; bounded
    // by probe count exactly like q26
    "q147_rp_ann",
    // month-spine construction: distinct-keys x month-sequence dimension
    // build — the broadcast side is the exploded month range (always tiny)
    "q11_impute", "q57_demand_assembly",
    // trim-bounds attach: monthly series x one global (y0, yN) row
    "q74_annual_to_monthly",
    // wildcard-rule lookup: facts x broadcast rules table (4 rows)
    "q77_mode_lookup",
    // IVF assignment: vectors x broadcast centroid table (10 rows).
    // NOTE q120_ivf_pq needs no entry: its coarse argmin is a literal
    // projection (collected centroids), so its plan is join-free
    "q81_ivf_ann",
    // partitioned-index IVF: only the PROBES (10 rows) cross the
    // broadcast centroid table at query time — the corpus-side
    // assignment happened once at index-build time, off this plan
    "q186_ivf_partitioned",
    // temperature-mix normalization: per-stratum counts x the ONE global
    // totals row — a single-row broadcast build side is the optimal plan
    // (no hash table needed); bounded by construction
    "q94_source_mix",
    // CPI base attach: monthly series x the ONE base-year HALF1 row
    "q97_workbook_cpi",
    // sketch-overlap pair generation: |sets|² inequality self-join over
    // the |sets|-row (7 ship years) sketch table — config-scale by
    // construction; the data-sized work happened in the sketch build
    "q158_hll_overlap",
    // hybrid RRF's vector arm is the q26 brute shape: corpus x ONE
    // broadcast probe row — bounded by probe count exactly like q26
    "q161_hybrid_rrf",
    // trailing-uniques sketch rollup: day×day range join over the
    // calendar-scale daily-partials frame — ≤7 rows per day by the
    // BETWEEN bound, never data-scale
    "q173_trailing_uniques",
    // recall scorer composes q26 (ground truth) and q147 verbatim, so it
    // inherits exactly their probe-bounded brute scans — the approximate
    // indexes under test (q29/q81/q109/q120) stay nested-loop-free, and
    // the scorer itself adds only equi-joins on (probe_id, neighbor_id)
    "q181_ann_recall",
    // incremental-IVF maintenance + probe: the q186 rationale twice —
    // the changeset arrivals and the 10 probes each cross ONLY the
    // broadcast centroid table (10 rows); the corpus side was assigned
    // at index-build time, off this plan
    "q204_ivf_incremental",
    // nDCG scorer: the q181 rationale verbatim — composes q26-shaped
    // ground truth (corpus x 10 broadcast probes) and q147's rerank;
    // everything the scorer ADDS is an equi-join on (probe_id,
    // neighbor_id)
    "q216_ndcg_eval",
    // PR-curve eval: the 7-row cutoff spine crosses the banded
    // candidate set (signature-collision bounded) on hamming <= cutoff
    // — config-scale x bounded, never data x data
    "q225_dedup_pr_curve",
    // context packing: retrieval is the q26 brute shape (corpus x 3
    // broadcast probes); the packing itself is keyed windows over k
    // rows per probe
    "q227_rag_context",
    // hard-negative mining: the q181 rationale — the TRUTH side is
    // q26's corpus x 10 broadcast probes brute scan; the LSH candidate
    // side stays a bucket equi-join, and everything the miner adds is
    // an anti-join on (probe_id, neighbor_id) + a probe-keyed window
    "q236_hard_negatives")
  // NOTE: q29_ann_lsh and q44_embedding_neardup are deliberately NOT in
  // this set any more — both route through hyperplane-bucket equi-joins
  // and must stay nested-loop-free (the round-1 scale-killer fix).

  test("no catalog query plans a CartesianProduct; nested-loop joins only where bounded") {
    Queries.all.foreach { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct")
      if (!nestedLoopAllowed(q.name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans an unexpected BroadcastNestedLoopJoin")
    }
  }

  test("central 3-way join broadcasts its dimension and prunes scan columns") {
    val plan = Queries.q03Join3way.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // lineitem scan must read only the 3 needed columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      "lineitem scan is not pruned to the projected columns")
  }

  /** Queries allowed to run a window with NO partition spec (all data to
    * one task). Deliberately-bounded series windows now go through the
    * Guards contract (constant partition + runtime row bound), so a truly
    * partition-less window is an error everywhere. */
  private val globalWindowAllowed = Set.empty[String]

  test("partition-less windows only on bounded series (single-task sort canary)") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    Queries.all.foreach { q =>
      val plan = q.run(spark, sf).queryExecution.executedPlan
      def hasGlobalWindow(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p.collectFirst {
          case w: WindowExec if w.partitionSpec.isEmpty => w
          case a: AdaptiveSparkPlanExec if hasGlobalWindow(a.executedPlan) => a
        }.isDefined
      if (!globalWindowAllowed(q.name))
        assert(!hasGlobalWindow(plan),
          s"${q.name} plans a partition-less Window over unbounded input")
    }
  }

  test("top-k plans as TakeOrderedAndProject, not a global-window sort") {
    val plan = Queries.q17Topk.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "q17 lost its TakeOrderedAndProject top-k")
  }

  test("probe filters are pushed to the parquet scan") {
    val plan = Queries.q26Knn.run(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)") ||
      plan.contains("LessThan(vec_id,10)"),
      s"vec_id<10 not pushed down")
  }
}
