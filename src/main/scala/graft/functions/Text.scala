package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, shingling.
  * All pure Column expressions (codegen-friendly; no UDFs), designed so the
  * same logic is expressible in ANSI SQL for the DuckDB oracle.
  */
object Text {

  /** Normalize: lowercase, collapse whitespace runs, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace token array / count. Empty or null text -> 0 tokens
    * (null-in must not leak a null array out — counts stay arithmetic). */
  def tokens(c: Column): Column = {
    val n = normalize(c)
    when(n.isNull || length(n) === 0, array().cast("array<string>"))
      .otherwise(split(n, " "))
  }

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Ratio of non-alphanumeric, non-space chars to total chars. */
  def punctRatio(c: Column): Column =
    when(length(c) > 0,
      length(regexp_replace(c, "[A-Za-z0-9 ]", "")).cast("double") / length(c))
      .otherwise(0.0)

  /** Mean token length — a cheap fluency proxy. */
  def meanTokenLen(c: Column): Column =
    when(tokenCount(c) > 0,
      length(regexp_replace(normalize(c), " ", "")).cast("double") / tokenCount(c))

  /** Stopword ratio against a fixed list (quality-scoring feature). */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(c)
    val stops = filter(toks, t => t.isin(stopwords.map(lit): _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks)).otherwise(0.0)
  }

  /** Composite quality score in [0,1]: length saturation × (1 - punct
    * excess) × stopword presence. Heuristic, deterministic, SQL-mirrorable.
    * The formula lives ONLY here — queries that precompute the inputs
    * (e.g. via tokenSetCounts) call this overload so the constants can't
    * drift between the expression form and the catalog.
    */
  def qualityScoreFrom(textLen: Column, punctRatio: Column, stopRatio: Column): Column =
    round(least(textLen.cast("double") / 500.0, lit(1.0))
      * greatest(lit(0.0), lit(1.0) - punctRatio * 5.0)
      * least(stopRatio * 5.0, lit(1.0)), 6)

  def qualityScore(c: Column, stopwords: Seq[String]): Column =
    qualityScoreFrom(length(c), punctRatio(c), stopwordRatio(c, stopwords))

  /** Language ID by marker-token counting: for each candidate language,
    * count occurrences of its marker tokens; argmax wins, ties broken by
    * the order of `markers` (n-gram-frequency heuristic in miniature).
    * Returns the language code, or "und" when no marker hits.
    */
  def langId(c: Column, markers: Seq[(String, Seq[String])]): Column = {
    val toks = tokens(c)
    // scores laid out as array<struct<score,idx>>; array_max picks
    // (max score, then lowest idx via negated index)
    val scored = markers.zipWithIndex.map { case ((lang, words), i) =>
      val score = size(filter(toks, t => t.isin(words.map(lit): _*)))
      struct(score.as("score"), lit(-i).as("negidx"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Document fingerprint: md5 of the normalized text — identical across
    * engines (md5 is standardized), the exact-dedup key. */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Word n-gram shingles as an array column (dedup/similarity input).
    *
    * Built with zip_with over shifted slices of the token array rather
    * than `transform(sequence(...), i => slice(toks, ...))`: a lambda
    * body that references an outer expression re-evaluates it PER ELEMENT
    * (the tokenizer regex would run once per shingle — measured as the
    * whole query's bottleneck). Here each shifted slice is evaluated once
    * per row and the lambdas only concatenate elements.
    */
  def wordShingles(c: Column, n: Int): Column = {
    require(n >= 1)
    slidingFold(tokens(c), n, (x, y) => concat(x, lit(" "), y), "array<string>")
  }

  /** The shared n-length sliding fold over an array: combine each element
    * with its (j-1)-shifted neighbor for j in 2..n, then trim the tail so
    * only full windows remain. One implementation for word shingles, char
    * shingles, and winnow minima — the zip_with construction exists because
    * lambda bodies referencing outer expressions re-evaluate them per
    * element (see wordShingles note).
    */
  private def slidingFold(
      arr: Column, n: Int,
      combine: (Column, Column) => Column,
      emptyType: String): Column = {
    val folded = (2 to n).foldLeft(arr) { (acc, j) =>
      zip_with(acc, slice(arr, lit(j), greatest(size(arr) - (j - 1), lit(0))), combine)
    }
    when(size(arr) >= n, slice(folded, lit(1), greatest(size(arr) - (n - 1), lit(0))))
      .otherwise(array().cast(emptyType))
  }

  /** BPE-ish subword tokenization: letter runs, digit runs, and single
    * symbols — the shape of a byte-pair pre-tokenizer's coarse split.
    * Same regex class evaluates identically under Java regex and RE2. */
  def subwordTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))

  /** Character k-gram shingles from a materialized char-array attribute
    * (see winnowFromHashes for why the staged form exists). */
  def charShinglesFrom(chars: Column, k: Int): Column =
    slidingFold(chars, k, (x, y) => concat(x, y), "array<string>")

  /** Single-expression char k-gram shingles (small inputs/tests). */
  def charShingles(c: Column, k: Int): Column =
    charShinglesFrom(split(normalize(c), ""), k)

  /** Sliding-window minima over an ALREADY-MATERIALIZED hash array column
    * (winnowing's second stage). `hashes` must be a bound attribute, not a
    * computed expression: Catalyst's subexpression elimination does not
    * cover higher-order-function trees, so a computed array referenced at
    * each fold level is re-evaluated per level (measured 8x the md5
    * pipeline per row — 55 s for 5000 docs). Callers stage the hash
    * computation behind an exchange (repartition) first.
    */
  def winnowFromHashes(hashes: Column, w: Int): Column =
    array_distinct(slidingFold(hashes, w, (x, y) => least(x, y), "array<bigint>"))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash
    * every char k-gram, take the min of each w-length sliding window of
    * hashes, dedup. Guarantees any shared substring of length >= k+w-1
    * yields a shared fingerprint. Single-expression form for small inputs
    * and tests; production-path callers should stage via winnowFromHashes.
    */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    winnowFromHashes(transform(charShingles(c, k), g => md5Hash64(g, 0)), w)

  /** One-pass token statistics via explode + conditional aggregation:
    * (id, n_tokens, one count column per named token set). For queries
    * scoring several token sets at once this beats repeated
    * `filter(tokens(c), ...)` expressions, which re-evaluate the whole
    * tokenizer per set (measured 3-8x on the bench).
    */
  def tokenSetCounts(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      sets: Seq[(String, Seq[String])]): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode_outer(tokens(col(textCol))).as("tok"))
    val aggs = count(when(col("tok").isNotNull, 1)).as("n_tokens") +:
      sets.map { case (name, words) =>
        count(when(col("tok").isin(words: _*), 1)).as(name)
      }
    toks.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** Repetition quality signals (the Gopher-class filters): type-token
    * ratio (distinct tokens / tokens — low = repetitive vocabulary) and
    * top-bigram share (occurrences of the most frequent word bigram /
    * total bigrams — high = boilerplate loops). Explode + two-level
    * aggregation behind one shuffle per signal; map-side partial
    * aggregation collapses each doc's tokens before the exchange.
    * Returns (id, n_tokens, ttr, top_bigram_share); docs with < 2 tokens
    * get a 0.0 bigram share.
    */
  def repetitionSignals(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"))
      .withColumn("ttr",
        when(col("n_tokens") > 0,
          col("n_distinct").cast("double") / col("n_tokens")).otherwise(0.0))
    val bigrams = df.select(col(idCol).as("id"),
        explode(wordShingles(col(textCol), 2)).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(sum("c").as("total_bg"), max("c").as("top_bg"))
      .withColumn("top_bigram_share",
        col("top_bg").cast("double") / col("total_bg"))
    toks.join(bigrams, Seq("id"), "left")
      .select(col("id"), col("n_tokens"), col("ttr"),
        coalesce(col("top_bigram_share"), lit(0.0)).as("top_bigram_share"))
  }

  /** PII-style scrubbing: replace every match of `pattern` with `token`
    * and count what was redacted (training-data hygiene; patterns kept to
    * portable regex classes that mean the same under Java regex and RE2).
    * Spark's regexp_replace is global by default — the DuckDB mirror
    * needs the 'g' flag. */
  def redact(c: Column, pattern: String, token: String): Column =
    regexp_replace(c, pattern, token)

  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  /** A 64-bit stable hash from the first 15 hex digits of md5 — engine-
    * portable (DuckDB: `('0x' || substr(md5(s),1,15))::BIGINT`). Used for
    * minhash; NOT a crypto hash. */
  def md5Hash64(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), c)), 1, 15), 16, 10)
      .cast("long")

  /** [[md5Hash64]] with a COLUMN seed — for per-element hashing inside
    * array lambdas (rendezvous shard scoring), where the seed is the
    * lambda variable. Identical bytes hashed, identical SQL mirror. */
  def md5Hash64Col(c: Column, seed: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), c)), 1, 15), 16, 10)
      .cast("long")
}
