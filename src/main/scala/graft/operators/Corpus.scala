package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines: sliding-
  * window chunking, train/test contamination detection, vocabulary
  * out-of-vocabulary scoring. All relational, no UDFs; each op's shape is
  * chosen for 100 TB (per-row explode with no shuffle, shingle-key joins
  * with map-side partial aggregation, bounded top-k vocab broadcast).
  */
object Corpus {

  /** Sliding-window token chunking with overlap — the standard
    * pretraining document splitter (context-window packing's upstream
    * twin). Each document becomes ceil((n - overlap) / stride) chunks of
    * up to `chunkTokens` tokens, starting every `stride` tokens. Per-row
    * explode only: NO shuffle at any scale; chunking 100 TB is a map-only
    * job. Zero-token documents produce zero chunks.
    *
    * Returns (idCol, chunk_id, n_chunk_tokens, chunk_text).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
      "need 1 <= stride <= chunkTokens (stride > chunk would drop tokens)")
    // materialize the token array once per doc BEFORE the explode — the
    // slice below then reads an attribute, not a re-evaluated regex tree
    val toks = df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
    toks
      .select(col(idCol),
        posexplode(sequence(lit(0), size(col("__toks")) - 1, lit(stride)))
          .as(Seq("chunk_id", "start")),
        col("__toks"))
      .withColumn("chunk_toks",
        slice(col("__toks"), col("start") + 1, lit(chunkTokens)))
      .select(col(idCol), col("chunk_id"),
        size(col("chunk_toks")).as("n_chunk_tokens"),
        array_join(col("chunk_toks"), " ").as("chunk_text"))
  }

  /** Train/test contamination detection — the decontamination primitive:
    * for every test document, how many of its distinct word n-grams also
    * appear anywhere in the train split, and in how many train docs.
    * Shingle both splits, equi-join on the shingle, two aggregations with
    * map-side partial agg.
    *
    * `hashKey = true` joins on `Text.md5Hash64(shingle)` instead of the
    * raw string — the 100 TB mode: an 8-gram key averages ~50 bytes and
    * the shuffle ships every (shingle, doc) pair, so the fixed 8-byte key
    * cuts shuffle width ~6x (same banding-vs-hash trade as MinHash LSH,
    * Dedup.minHashLshPairs). A 64-bit hash makes cross-doc collisions
    * negligible (~n^2/2^64); per-doc totals count the pre-hash distinct
    * shingles either way. Both modes sit under their own DuckDB oracle
    * (q88 raw, q98 hashed).
    *
    * `isTest` partitions df (e.g. col("doc_id") % 20 === 0). Returns
    * (test_id, total_ngrams, contaminated_ngrams, n_contaminating_docs,
    * contamination_ratio) — one row per test doc with >= 1 n-gram.
    */
  def contamination(df: DataFrame, idCol: String, textCol: String,
                    isTest: org.apache.spark.sql.Column, n: Int,
                    hashKey: Boolean = false): DataFrame = {
    val keyed =
      if (hashKey) Text.md5Hash64(col("shingle"), 0) else col("shingle")
    val sh = df.select(col(idCol).as("id"), isTest.as("is_test"),
        explode(array_distinct(Text.wordShingles(col(textCol), n))).as("shingle"))
      .select(col("id"), col("is_test"), keyed.as("key"))
    val test = sh.where(col("is_test")).select(col("id").as("test_id"), col("key"))
    val train = sh.where(!col("is_test")).select(col("key"), col("id").as("train_id"))
    // per-doc distinct-shingle count is computable BEFORE the explode:
    // size(array_distinct(...)) per row, map-only — shuffling every test
    // shingle just to count it would be the single widest exchange here
    // at corpus scale (pre-hash count, so hashKey mode reports the same
    // totals; the >0 filter matches the explode dropping empty arrays)
    val totals = df.where(isTest)
      .select(col(idCol).as("test_id"),
        size(array_distinct(Text.wordShingles(col(textCol), n)))
          .cast("long").as("total_ngrams"))
      .where(col("total_ngrams") > 0)
    val hits = test.join(train, "key")
      .groupBy("test_id")
      .agg(countDistinct(col("key")).as("contaminated_ngrams"),
        countDistinct(col("train_id")).as("n_contaminating_docs"))
    totals.join(hits, Seq("test_id"), "left")
      .select(col("test_id"), col("total_ngrams"),
        coalesce(col("contaminated_ngrams"), lit(0L)).as("contaminated_ngrams"),
        coalesce(col("n_contaminating_docs"), lit(0L)).as("n_contaminating_docs"),
        round(coalesce(col("contaminated_ngrams"), lit(0L)).cast("double") /
          col("total_ngrams"), 6).as("contamination_ratio"))
  }

  /** Maximal duplicated-substring spans — the k-gram island equivalent of
    * suffix-array exact-substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": flag any substring of
    * >= k tokens that appears verbatim in more than one document). The
    * suffix-array build the paper uses is a single-machine construction;
    * the distributed identity that replaces it: a duplicated run of
    * j >= k consecutive tokens appears as exactly j-k+1 consecutive
    * duplicated k-gram starts, so merging consecutive duplicated starts
    * per document (gaps-and-islands) recovers precisely the maximal
    * duplicated spans. Every stage is then a bounded-key relational op:
    *   overlapping-shingle explode (map-only) → k-gram-hash distinct +
    *   count (the one corpus-wide shuffle — same shape, same map-side
    *   combine as [[contamination]]) → per-document island windows
    *   (entity-keyed, naturally parallel, bounded by doc length).
    * 8-byte md5-derived keys stand in for shingle text (collision odds
    * ~n²/2⁶⁴ — the q27/q98 trade).
    *
    * Returns, per document owning at least one cross-document duplicated
    * span: (idCol, n_spans, dup_tokens, n_tokens, dup_ratio).
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    require(k >= 2, "span length must be >= 2 tokens")
    val toks = df.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= k)
    val grams = toks
      .select(col("id"), size(col("__toks")).cast("long").as("n_tokens"),
        explode(sequence(lit(0), size(col("__toks")) - k)).as("start"),
        col("__toks"))
      .select(col("id"), col("n_tokens"), col("start"),
        Text.md5Hash64(
          array_join(slice(col("__toks"), col("start") + 1, lit(k)), " "), 0)
          .as("key"))
    // cross-document only: a k-gram repeated inside one doc is repetition
    // (q82's signal), not corpus duplication
    val dupKeys = grams.select("key", "id").distinct()
      .groupBy("key").agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= 2).select("key")
    val w = Window.partitionBy("id").orderBy("start")
    grams.join(dupKeys, "key")
      .withColumn("__isl", col("start") - row_number().over(w))
      .groupBy(col("id"), col("__isl"))
      .agg(min("start").as("s0"), max("start").as("e0"),
        min("n_tokens").as("n_tokens"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e0") - col("s0") + lit(k)).as("dup_tokens"),
        min("n_tokens").as("n_tokens"))
      .select(col("id").as(idCol), col("n_spans"), col("dup_tokens"),
        col("n_tokens"),
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
          .as("dup_ratio"))
  }

  /** The APPLY step of exact-substring dedup — rewrite each document
    * with its cross-document duplicated spans EXCISED (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": drop
    * the duplicated substring, keep the unique remainder — deleting
    * whole documents over one shared span throws away unique text, and
    * keeping the span trains the model on it twice). [[duplicateSpans]]
    * is the detector; this is the surgeon.
    *
    * Excision is symmetric (every occurrence goes, not all-but-one) —
    * the conservative mode: a canonical-keeper needs a global
    * min-doc-per-span election whose output depends on doc ids, while
    * symmetric excision is a pure function of the duplicated-k-gram set,
    * so it stays map-shaped after the one dup-key join.
    *
    * Plan: the same stride-1 k-gram census as [[duplicateSpans]] (one
    * partial-agg'd shuffle over hashed keys), then ONLY duplicated grams
    * explode to their k covered token positions (work scales with
    * duplicated content, not corpus size), distinct-collapsed and
    * collected per doc — a set bounded by the doc's own token count.
    * The rewrite is a map-side HOF: filter tokens whose index is in the
    * removed set, re-join with single spaces. Per-doc cost is
    * O(n_tokens · removed) worst case — bounded by document length, the
    * same envelope as every other per-doc HOF here.
    *
    * Returns one row per input document:
    * (idCol, n_tokens, removed_tokens, clean_text) — clean_text is ''
    * for a fully-duplicated doc, the untouched re-join for a clean one.
    */
  def exciseDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           k: Int): DataFrame = {
    require(k >= 2, "span length must be >= 2 tokens")
    val toks = df.select(col(idCol).as("id"),
      Text.tokens(col(textCol)).as("__toks"))
    val grams = toks.where(size(col("__toks")) >= k)
      .select(col("id"),
        explode(sequence(lit(0), size(col("__toks")) - k)).as("start"),
        col("__toks"))
      .select(col("id"), col("start"),
        Text.md5Hash64(
          array_join(slice(col("__toks"), col("start") + 1, lit(k)), " "), 0)
          .as("key"))
    val dupKeys = grams.select("key", "id").distinct()
      .groupBy("key").agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= 2).select("key")
    val removed = grams.join(dupKeys, "key")
      .select(col("id"),
        explode(sequence(col("start"), col("start") + lit(k - 1))).as("pos"))
      .distinct()
      .groupBy("id").agg(sort_array(collect_set(col("pos"))).as("__rm"))
    toks.join(removed, Seq("id"), "left")
      .select(col("id").as(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        coalesce(size(col("__rm")).cast("long"), lit(0L)).as("removed_tokens"),
        when(col("__rm").isNull, array_join(col("__toks"), " "))
          .otherwise(array_join(
            filter(col("__toks"),
              (_, i) => !array_contains(col("__rm"), i)), " "))
          .as("clean_text"))
  }

  /** Cross-document span dedup signal — the C4-style boilerplate filter:
    * split every document into NON-overlapping `spanTokens`-token spans
    * (the k-token analogue of C4's three-sentence span), and for each
    * document report how many of its spans also occur in at least one
    * OTHER document. High dup_ratio = boilerplate/mirrored content.
    *
    * Plan: reuses [[chunk]] (map-only span explode), hashes each span to
    * a fixed 8-byte key (same shuffle-width trade as the hashed
    * contamination join), computes per-span distinct-doc counts behind
    * one partial-agg'd shuffle, and joins back on the span key. Heavy-
    * hitter spans (the boilerplate itself) concentrate on single keys;
    * the per-span aggregate is a count, so AQE's skew handling and
    * map-side combine keep the hot keys cheap.
    *
    * Returns (idCol, n_spans, dup_spans, dup_ratio) per document with
    * >= 1 span.
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
                spanTokens: Int): DataFrame = {
    val spans = chunk(df, idCol, textCol, spanTokens, spanTokens)
      .select(col(idCol).as("id"),
        Text.md5Hash64(col("chunk_text"), 0).as("key"))
    val spanDocs = spans.select(col("key"), col("id")).distinct()
      .groupBy("key").agg(count(lit(1)).as("n_docs_with_span"))
    // per-doc span count is pure arithmetic on the token count —
    // ceil(n/k) computed map-side, so only DUPLICATED spans (the
    // boilerplate subset) flow through the per-doc aggregation instead
    // of every span of every document (same trade as contamination's
    // map-side totals)
    val totals = df
      .select(col(idCol).as("id"),
        Text.tokenCount(col(textCol)).cast("long").as("__n_tok"))
      .where(col("__n_tok") > 0)
      .select(col("id"),
        (((col("__n_tok") - 1) / spanTokens).cast("long") + 1).as("n_spans"))
    val dups = spans
      .join(spanDocs.where(col("n_docs_with_span") >= 2).select("key"), "key")
      .groupBy("id").agg(count(lit(1)).as("dup_spans"))
    totals.join(dups, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        round(coalesce(col("dup_spans"), lit(0L)).cast("double") /
          col("n_spans"), 6).as("dup_ratio"))
  }

  /** Intra-document boilerplate line removal — C4's published line rules
    * (Raffel et al. 2020, JMLR: "we only retained lines that ended in a
    * terminal punctuation mark ... discarded [pages] with fewer than N
    * words per line on average"; jusText/CCNet run the same family): a
    * line survives iff it (a) ends in terminal punctuation [.!?"],
    * (b) is at least `minChars` chars trimmed, (c) has at least
    * `minWords` whitespace words. Navigation chrome, footers, and menu
    * fragments fail (a)+(c).
    *
    * The whole operator is ONE map-side projection — split / filter /
    * array_join higher-order functions, no explode, no shuffle, nothing
    * but the scan at any corpus size (the q87 chunking contract). The
    * lambda predicates are engine-portable: the DuckDB oracle's
    * list_filter evaluates the identical rules.
    *
    * Adds (n_lines, n_kept, cleaned) to the input rows; `cleaned` is the
    * surviving lines re-joined with newlines.
    */
  def lineClean(df: DataFrame, textCol: String, minChars: Int = 30,
                minWords: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]\\s*$") &&
        length(trim(l)) >= minChars &&
        size(split(trim(l), "\\s+")) >= minWords)
    df.withColumn("__lines", lines)
      .withColumn("__kept", kept)
      .withColumn("n_lines", size(col("__lines")))
      .withColumn("n_kept", size(col("__kept")))
      .withColumn("cleaned", array_join(col("__kept"), "\n"))
      .drop("__lines", "__kept")
  }

  /** Corpus vocabulary + per-document out-of-vocabulary rate — the
    * vocabulary-coverage quality filter. The top-K vocab is a global
    * word count then a bounded orderBy(count desc, word).limit(K)
    * (TakeOrderedAndProject — no single-partition window at any corpus
    * size, K rows on the driver), broadcast back as a left join. Docs
    * with zero tokens report oov_ratio 0.
    *
    * Returns (idCol, n_tokens, oov_tokens, oov_ratio).
    */
  def vocabOov(df: DataFrame, idCol: String, textCol: String,
               topK: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode_outer(Text.tokens(col(textCol))).as("tok"))
    val vocab = toks.where(col("tok").isNotNull)
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(topK)
      .select(col("tok").as("__v"))
    toks.join(broadcast(vocab), col("tok") === col("__v"), "left")
      .groupBy("id")
      .agg(count(col("tok")).as("n_tokens"),
        count(when(col("tok").isNotNull && col("__v").isNull, 1)).as("oov_tokens"))
      .select(col("id").as(idCol), col("n_tokens"), col("oov_tokens"),
        when(col("n_tokens") > 0,
          round(col("oov_tokens").cast("double") / col("n_tokens"), 6))
          .otherwise(0.0).as("oov_ratio"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022 — "FIM":
    * split a document into prefix/middle/suffix and emit
    * `<PRE>prefix<SUF>suffix<MID>middle`, teaching an autoregressive
    * model to infill; applied to a deterministic hash-selected fraction
    * of the corpus, the paper's 50% convention). Everything is
    * map-only expression work — selection, both split points and the
    * rearrangement derive from md5 hashes and substring arithmetic, so
    * the transform is a pure function of (id, text, pct, salt),
    * reproducible on any cluster size and replayable by a SQL oracle.
    *
    * Split geometry: prefix and suffix lengths are each drawn from
    * [1, ⌊len/3⌋] (hash mod), so all three parts are non-empty for any
    * doc passing `minChars`. Returns ONLY the transformed rows:
    * (<idCol>, prefix, middle, suffix, fim_text). */
  def fim(df: DataFrame, idCol: String, textCol: String,
          minChars: Int = 20, pct: Int = 50, salt: Int = 30): DataFrame = {
    require(minChars >= 3, "minChars must allow three non-empty parts")
    require(pct >= 1 && pct <= 100, s"pct must be in [1, 100], got $pct")
    val t = col(textCol)
    val len = length(t)
    val idS = col(idCol).cast("string")
    val sel = pmod(Text.md5Hash64(idS, salt), lit(100)) < pct
    val third = floor(len / lit(3.0)).cast("long")
    val a = lit(1L) + pmod(Text.md5Hash64(idS, salt + 1), third)
    val b = lit(1L) + pmod(Text.md5Hash64(idS, salt + 2), third)
    df.where(t.isNotNull && len >= minChars && sel)
      .withColumn("prefix", t.substr(lit(1), a.cast("int")))
      .withColumn("middle",
        t.substr((a + 1L).cast("int"), (len - a - b).cast("int")))
      .withColumn("suffix", t.substr((len - b + 1L).cast("int"), b.cast("int")))
      .select(col(idCol), col("prefix"), col("middle"), col("suffix"),
        concat(lit("<PRE>"), col("prefix"), lit("<SUF>"), col("suffix"),
          lit("<MID>"), col("middle")).as("fim_text"))
  }
}
