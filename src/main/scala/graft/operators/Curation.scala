package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: keyword
  * relevance scoring (BM25), token-length census for packing/budget
  * planning, deterministic hash-based splits, and per-group top-N
  * selection. All pure relational plans — the shapes here are chosen for
  * 100 TB: map-side doc stats, broadcast term/total dimensions, keyed
  * windows only.
  */
object Curation {

  /** Okapi BM25 score of every document against a fixed query-term set —
    * the standard keyword-relevance ranker for corpus curation ("score
    * the crawl against a topic wordlist").
    *
    * Plan shape, scan to answer:
    *  - per-doc length `dl` is computed map-side and carried through the
    *    term-frequency groupBy as a grouping key — the document table is
    *    scanned ONCE, with no per-doc join back;
    *  - document frequencies (one row per query term) and the global
    *    (N, avgdl) aggregate (ONE row) come back as broadcast equi-joins;
    *    the global row joins on a constant NON-FOLDABLE key
    *    ([[Guards.constKey]]) so the plan stays a BroadcastHashJoin, not
    *    a nested-loop (same contract as the plan canary enforces);
    *  - the only shuffle proportional to data is the (doc, term)
    *    term-frequency aggregation, which map-side partial agg collapses
    *    to at most |terms| rows per document per task.
    *
    * Cross-engine float determinism: each per-term contribution is a pure
    * scalar expression (identical tree in the DuckDB oracle), rounded to
    * 9 dp and summed EXACTLY as decimal — the one cross-row reduction is
    * order-independent, so Spark and the oracle agree bit-for-bit.
    *
    * Returns (idCol, n_terms_matched, bm25) for docs matching >= 1 term.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val base = df.select(col(idCol).as("id"),
      Text.tokens(col(textCol)).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
    // ONE global row: corpus size + average doc length. The join key must
    // be non-foldable on BOTH sides — a literal here lets Catalyst rewrite
    // the equi-join as (filter + trivially-true join) = nested loop
    val totals = base.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl"))
      .withColumn("__k", Guards.constKey(col("n_docs")))
    val tf = base
      .select(col("id"), col("dl"), explode(col("__toks")).as("tok"))
      .where(col("tok").isin(terms: _*))
      .groupBy("id", "dl", "tok")
      .agg(count(lit(1)).as("tf"))
    // document frequency per term: tf is unique on (id, tok)
    val dft = tf.groupBy("tok").agg(count(lit(1)).as("df_t"))
    val contrib = {
      val avgdl = col("sum_dl").cast("double") / col("n_docs")
      val idf = log(lit(1.0) +
        (col("n_docs") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5)))
      val tfNorm = (col("tf") * (lit(k1) + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
      round(idf * tfNorm, 9)
    }
    tf.join(broadcast(dft), "tok")
      .withColumn("__k", Guards.constKey(col("id")))
      .join(broadcast(totals), "__k")
      .withColumn("contrib", contrib.cast("decimal(28,9)"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms_matched"),
        round(sum(col("contrib")).cast("double"), 6).as("bm25"))
      .select(col("id").as(idCol), col("n_terms_matched"), col("bm25"))
  }

  /** Power-of-two token-length census with cumulative token share — the
    * planning table behind context-length and packing decisions ("what
    * fraction of corpus tokens sit in docs shorter than 2^k?").
    *
    * bucket = floor(log2(n_tokens)) computed INTEGRALLY as
    * length(bin(n)) - 1 — no float log at any row. The histogram is one
    * map-side-combined groupBy to <= 64 rows; the cumulative pass is a
    * single-partition window over those rows under the [[Guards]]
    * contract (constant partition + runtime bound), which is exactly the
    * bounded-series case the plan canary allows. Zero-token docs are
    * excluded (no defined bucket).
    *
    * Returns (bucket, n_docs, total_tokens, token_share, cum_token_share)
    * with shares as exact-integer ratios rounded to 6 dp.
    */
  def lengthHistogram(df: DataFrame, textCol: String): DataFrame = {
    val hist = df
      .select(Text.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("bucket", (length(bin(col("n_tokens"))) - 1).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
    val one = Guards.constKey(col("bucket"))
    val cum = Window.partitionBy(one).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(one)
    hist
      .withColumn("cum_tokens",
        Guards.bounded(sum(col("total_tokens")).over(cum), col("bucket"),
          "length-histogram buckets", maxRows = 128))
      .withColumn("grand", sum(col("total_tokens")).over(all))
      .select(col("bucket"), col("n_docs"), col("total_tokens"),
        round(col("total_tokens").cast("double") / col("grand"), 6)
          .as("token_share"),
        round(col("cum_tokens").cast("double") / col("grand"), 6)
          .as("cum_token_share"))
  }

  /** Deterministic content-addressed train/val/test split — the
    * reproducible-split primitive: bucket = first 16 bits of md5(id) mod
    * 100, so membership depends only on the id (stable across runs,
    * cluster sizes, and orderings; adding data never reshuffles existing
    * assignments). Pure per-row expression: splitting 100 TB is map-only.
    *
    * `cuts` = (trainPct, valPct): bucket < trainPct -> train,
    * < trainPct+valPct -> val, else test.
    */
  def hashSplit(idc: Column, cuts: (Int, Int) = (80, 10)): Column = {
    require(cuts._1 >= 0 && cuts._2 >= 0 && cuts._1 + cuts._2 <= 100,
      s"hashSplit cuts must be non-negative percentages summing <= 100, got $cuts")
    val bucket = conv(substring(md5(idc.cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    when(bucket < cuts._1, "train")
      .when(bucket < cuts._1 + cuts._2, "val")
      .otherwise("test")
  }

  /** Top-N rows per group by an explicit TOTAL order — the per-domain /
    * per-language curation cut ("keep the 5 best documents per bucket").
    * Keyed window (parallel by group key at any scale) + rank filter;
    * callers must make `order` total (tie-broken by a unique key) or the
    * selection is nondeterministic.
    */
  def topNPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rk", row_number().over(w)).where(col("rk") <= n)
  }

  /** DSIR-style hashed n-gram importance weights (Xie et al., "Data
    * Selection for Language Models via Importance Resampling", NeurIPS
    * 2023): score every document by how target-like its hashed unigram
    * feature distribution is,
    *
    *   weight(doc) = sum over tokens of
    *     ln p_target(bucket(tok)) - ln p_raw(bucket(tok))
    *
    * with add-alpha-smoothed bucket distributions over `buckets` hashed
    * feature buckets, target = the `isTarget` slice, raw = the whole
    * corpus. The bucket hash is the engine-portable md5-derived 64-bit
    * hash ([[graft.functions.Text.md5Hash64]]), so the DuckDB oracle
    * reproduces bucketing exactly.
    *
    * Plan shape: ONE explode pass builds per-(doc, bucket) token counts
    * with map-side combine; both distributions fall out of that table in
    * a <= `buckets`-row aggregate (the target flag rides the groupBy, so
    * no second corpus scan for the target counts); the per-bucket
    * log-ratio table is a broadcast dimension of `buckets` rows; the only
    * data-sized shuffle is the (doc, bucket) aggregation. At 100 TB the
    * per-(doc, bucket) frame would be persisted once and reused — here it
    * is evaluated for the dimension build and the scoring join (two scans,
    * same discipline as contamination).
    *
    * Per-bucket log-ratios are rounded to 9 dp; each (doc, bucket)
    * contribution n * lr is a double product of identical operands on
    * both engines, re-rounded to 9 dp and summed as exact decimal
    * (order-independent — the bm25 discipline).
    *
    * Returns (idCol, n_tokens, dsir_weight) for docs with >= 1 token.
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 256,
                  alpha: Double = 1.0, seed: Int = 7): DataFrame = {
    require(buckets > 0, s"dsirWeights needs a positive bucket count, got $buckets")
    val bcnt = df
      .select(col(idCol).as("id"), isTarget.as("__t"),
        explode(Text.tokens(col(textCol))).as("tok"))
      .withColumn("bucket", pmod(Text.md5Hash64(col("tok"), seed), lit(buckets.toLong)))
      .groupBy("id", "__t", "bucket")
      .agg(count(lit(1)).as("n"))
    val perBucket = bcnt.groupBy("bucket")
      .agg(sum(when(col("__t"), col("n")).otherwise(0L)).as("ct"),
        sum(col("n")).as("cr"))
    val totals = perBucket
      .agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
      .withColumn("__k", Guards.constKey(col("tt")))
    val lr = round(
      log((col("ct") + lit(alpha)) / (col("tt") + lit(alpha * buckets))) -
        log((col("cr") + lit(alpha)) / (col("tr") + lit(alpha * buckets))), 9)
    val dim = perBucket
      .withColumn("__k", Guards.constKey(col("bucket")))
      .join(broadcast(totals), "__k")
      .select(col("bucket"), lr.as("lr"))
    bcnt
      .join(broadcast(dim), "bucket")
      .withColumn("__c", round(col("n") * col("lr"), 9).cast("decimal(28,9)"))
      .groupBy("id")
      .agg(sum(col("n")).as("n_tokens"),
        round(sum(col("__c")).cast("double"), 6).as("dsir_weight"))
      .select(col("id").as(idCol), col("n_tokens"), col("dsir_weight"))
  }

  /** Gopher's published stopword set (Rae et al. 2021, A1.1): a document
    * must CONTAIN at least two of these — distinct containment, not
    * occurrence count. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher document-quality rule battery (Rae et al., "Scaling
    * Language Models: Methods, Analysis & Insights from Training Gopher",
    * 2021, Appendix A1.1) as pure per-row expressions — the published
    * heuristic filter suite every large text pipeline runs before
    * training. Map-only: filtering 100 TB never shuffles.
    *
    * Rules (each a boolean column; `pass_all` is their conjunction),
    * matching the paper's semantics:
    *  - `r_words`:    50 <= word count <= 100,000
    *  - `r_meanlen`:  3 <= mean word length <= 10 (computed integrally
    *                  from the normalized text: (chars - spaces) / words)
    *  - `r_symbol`:   hash-to-word ratio <= 0.1 AND ellipsis-to-word
    *                  ratio <= 0.1 (each symbol thresholded SEPARATELY,
    *                  per the paper)
    *  - `r_bullet`:   <= 90% of lines start with a bullet
    *  - `r_ellipsis`: <= 30% of lines end with an ellipsis
    *  - `r_alpha`:    >= 80% of words contain an alphabetic character
    *  - `r_stop`:     contains >= 2 DISTINCT words of `stopwords`
    *                  (default [[GopherStopwords]])
    */
  def gopherFlags(df: DataFrame, textCol: String,
                  stopwords: Seq[String] = GopherStopwords): DataFrame = {
    val t = col(textCol)
    val norm = Text.normalize(t)
    // tokenize once into a bound attribute: three rules consume the
    // token array, and a repeated Text.tokens(t) tree leans on codegen
    // subexpression elimination instead of guaranteeing one evaluation.
    // The name is operator-scoped so a caller's own working columns
    // (the bare __toks convention used by bm25/bigramNll frames) are
    // never clobbered by the trailing drop
    val toks = col("__gopher_toks")
    val nWords = size(toks).cast("long")
    val meanLen = (length(norm) - (nWords - 1)).cast("double") / nWords
    val hashes = size(regexp_extract_all(t, lit("#"), lit(0)))
    val ellipses = size(regexp_extract_all(t, lit("\\.\\.\\."), lit(0)))
    val lines = split(t, "\n")
    val bulletFrac = size(filter(lines, l => trim(l).rlike("^[-*•]")))
      .cast("double") / size(lines)
    val ellipsisFrac = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$")))
      .cast("double") / size(lines)
    val alphaFrac = size(filter(toks, w => w.rlike("[A-Za-z]")))
      .cast("double") / nWords
    val stopDistinct =
      size(array_intersect(toks, array(stopwords.map(lit): _*)))
    df
      .withColumn("__gopher_toks", Text.tokens(t))
      .withColumn("n_words", nWords)
      .withColumn("r_words", nWords.between(50L, 100000L))
      .withColumn("r_meanlen", nWords > 0 && meanLen.between(3.0, 10.0))
      .withColumn("r_symbol", nWords > 0 &&
        hashes / nWords.cast("double") <= 0.1 &&
        ellipses / nWords.cast("double") <= 0.1)
      .withColumn("r_bullet", bulletFrac <= 0.9)
      .withColumn("r_ellipsis", ellipsisFrac <= 0.3)
      .withColumn("r_alpha", nWords > 0 && alphaFrac >= 0.8)
      .withColumn("r_stop", stopDistinct >= 2)
      .withColumn("pass_all",
        col("r_words") && col("r_meanlen") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") && col("r_stop"))
      .drop("__gopher_toks")
  }

  /** Jensen-Shannon divergence of each corpus slice's unigram
    * distribution against the whole corpus — the standard drift /
    * slice-skew readout (base-2 log, so 0 = identical, 1 = disjoint).
    * With P the slice distribution and Q the corpus distribution,
    *
    *   JSD = 0.5·Σ P·log2(2P/(P+Q)) + 0.5·Σ Q·log2(2Q/(P+Q))
    *
    * and every token OUTSIDE the slice's vocabulary has P=0, where the
    * Q-term degenerates to 0.5·Q — so the out-of-slice tail is
    * 0.5·(1 − Σ_{slice vocab} Q) and NO slice×vocabulary cross join is
    * needed: one vocab-keyed equi-join between the slice term counts and
    * the corpus term counts covers every non-degenerate term.
    *
    * Plan shape: one explode pass → (slice, token) counts with map-side
    * combine (the data-proportional shuffle), corpus token counts from
    * the same exploded frame, joined on the token key; slice totals
    * (|slices| rows) and the corpus total (ONE row, [[Guards.constKey]])
    * come back as broadcasts. Per-token terms are identical scalar trees
    * in the DuckDB oracle, rounded to 12 dp and summed exactly as
    * decimal — the cross-row reduction is order-free (the bm25
    * discipline).
    *
    * Returns (sliceCol, n_tokens, n_types, jsd).
    */
  def jsDivergence(df: DataFrame, sliceCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(sliceCol).as("slice"),
      explode(Text.tokens(col(textCol))).as("tok"))
    val sliceCounts = toks.groupBy("slice", "tok").agg(count(lit(1)).as("cs"))
    val corpusCounts = toks.groupBy("tok").agg(count(lit(1)).as("cc"))
    val sliceTotals = sliceCounts.groupBy("slice")
      .agg(sum("cs").as("ts"), count(lit(1)).as("n_types"))
    val corpusTotal = corpusCounts.agg(sum("cc").as("tc"),
      Guards.constKey(min(col("tok"))).as("__k"))
    val joined = sliceCounts
      .join(corpusCounts, "tok")
      .join(broadcast(sliceTotals), "slice")
      .withColumn("__k", Guards.constKey(col("tok")))
      .join(broadcast(corpusTotal), "__k")
    val p = col("cs").cast("double") / col("ts")
    val q = col("cc").cast("double") / col("tc")
    val term = (lit(0.5) * p * log2(lit(2) * p / (p + q)) +
      lit(0.5) * q * log2(lit(2) * q / (p + q)))
    joined
      .select(col("slice"), col("ts"), col("n_types"),
        round(term, 12).cast("decimal(28,12)").as("__t"),
        round(q, 12).cast("decimal(28,12)").as("__q"))
      .groupBy("slice")
      .agg(min("ts").as("n_tokens"), min("n_types").as("n_types"),
        sum("__t").as("__terms"), sum("__q").as("__qcov"))
      .select(col("slice").as(sliceCol), col("n_tokens"), col("n_types"),
        round(col("__terms").cast("double") +
          lit(0.5) * (lit(1.0) - col("__qcov").cast("double")), 6).as("jsd"))
  }
}
