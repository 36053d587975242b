package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical language-model scoring for corpus curation — the
  * CCNet-style "perplexity against a reference model" quality signal
  * (Wenzek et al., CCNet, LREC 2020: filter a crawl by the perplexity of
  * a model trained on a trusted corpus). The reference wrangler has no
  * LM tier; this is part of the training-data-pipeline extension the
  * engine adds on top of its operator inventory.
  *
  * The model is an add-one-smoothed bigram model estimated from a
  * deterministic reference slice of the corpus itself (callers pass the
  * membership predicate — [[Curation.hashSplit]] keeps it reproducible).
  *
  *   p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
  *
  * with V = reference vocabulary size, and a document scores the mean
  * negative log-likelihood of its bigrams (lower = more reference-like).
  *
  * Plan shape, chosen for 100 TB:
  *  - the BIGRAM count table is the large dimension: its build is one
  *    explode + map-side-combined groupBy, and scoring joins it by a
  *    plain shuffle equi-join on the bigram key — never broadcast,
  *    never nested-loop;
  *  - the UNIGRAM table is vocabulary-sized (bounded by language, not by
  *    corpus), so it ships broadcast; the vocab-size scalar rides a
  *    one-row broadcast on a non-foldable constant key
  *    ([[Guards.constKey]] — the plan-canary contract);
  *  - per-bigram NLL is rounded to 9 dp and summed as exact decimal, so
  *    the one order-dependent reduction is order-independent and the
  *    result hash-matches the DuckDB oracle bit-for-bit (same discipline
  *    as [[Curation.bm25]]).
  *
  * The tokenized/shingled frame is materialized once (localCheckpoint)
  * and feeds all four branches (unigrams, bigrams, vocab, scoring) — at
  * 100 TB a pipeline would persist the trained count tables themselves
  * and reuse them across scoring runs (they are corpus-derived
  * dimensions, exactly the shape [[Sketches]] persists for HLL
  * partials).
  */
object LangModel {

  /** Mean bigram negative log-likelihood per document under an add-one
    * bigram model trained on the `isRef` slice. Documents with fewer than
    * two tokens have no bigrams and produce no row.
    *
    * Returns (idCol, n_bigrams, avg_nll).
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                isRef: Column): DataFrame = {
    // tokenize + shingle ONCE: the frame feeds four branches (unigrams,
    // bigrams, vocab, scoring) and the shingle expressions dominate the
    // scan cost — the same measured 3+-reads rule that checkpoints the
    // prefix-join shingle sets (sf0.1 steady state: 4.8 s -> ~2.5 s)
    val base = docs.select(col(idCol).as("id"),
      Text.wordShingles(col(textCol), 2).as("__bi"),
      Text.tokens(col(textCol)).as("__toks"), isRef.as("__ref"))
      .localCheckpoint()
    // unigram counts + vocab size from the reference slice
    val uni = base.where(col("__ref"))
      .select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
      .withColumn("__k", Guards.constKey(col("v")))
    // bigram counts from the reference slice — the large dimension
    val bi = base.where(col("__ref"))
      .select(explode(col("__bi")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    // every document's bigrams, with multiplicity; w1 recovered from the
    // shingle (tokens cannot contain the separator — Text.tokens splits
    // on single spaces of the normalized text)
    val docBi = base
      .select(col("id"), explode(col("__bi")).as("bg"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
    // v = 0 (an EMPTY reference slice) leaves the model undefined; the
    // guard returns null scores instead of tripping ANSI divide-by-zero
    // (n_bigrams stays honest, so the caller can see what went unscored)
    val nll = when(col("v") > 0, round(-log(
      (coalesce(col("c12"), lit(0L)) + lit(1.0)) /
        (coalesce(col("c1"), lit(0L)) + col("v"))), 9))
    docBi
      .join(bi, Seq("bg"), "left")
      .join(broadcast(uni.withColumnRenamed("w", "w1")), Seq("w1"), "left")
      .withColumn("__k", Guards.constKey(col("id")))
      .join(broadcast(vocab), "__k")
      .withColumn("__nll", nll.cast("decimal(28,9)"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__nll")).cast("double") / count(lit(1)), 6)
          .as("avg_nll"))
      .select(col("id").as(idCol), col("n_bigrams"), col("avg_nll"))
  }
}
