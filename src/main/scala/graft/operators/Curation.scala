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
}
