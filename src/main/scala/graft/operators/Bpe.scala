package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training (Sennrich, Haddow & Birch, ACL 2016
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * vocabulary-induction stage behind every BPE tokenizer. q60 APPLIES a
  * subword segmentation; this LEARNS the merge table, the init→trained
  * progression the PQ codebook got this round.
  *
  * Distributed shape (the standard one): training state is the
  * word-frequency table (word, freq, symbols[]) — corpus-scale text
  * collapses to vocabulary-scale state in one tokenize + groupBy, and
  * every round after that touches only the vocabulary:
  *  - pair counting is one explode over adjacent symbol positions +
  *    a freq-weighted sum — partial-agg combine applies, the shuffle
  *    carries (partitions x distinct pairs) rows;
  *  - the winner is a ONE-row collect (max count, ties to the
  *    lexicographically smallest pair — deterministic);
  *  - the merge applies as a map-side index fold per word (greedy
  *    left-to-right non-overlapping, the paper's semantics — a run of
  *    k identical symbols merges floor(k/2) pairs);
  *  - `localCheckpoint` cuts lineage each round (the PageRank/bfsHops
  *    discipline: one job per round, no geometric plan growth).
  *
  * At 100 TB the word-frequency table is still vocabulary-sized (the
  * corpus scan happens once), so rounds cost vocabulary work, not
  * corpus work — which is why production BPE trainers run on one
  * machine after the distributed count; this keeps even that state
  * distributed. Engine-portable: the DuckDB oracle replays the same
  * recurrence with a recursive CTE per round and matches bit-for-bit.
  */
object Bpe {

  /** One greedy left-to-right merge pass of the literal pair (a, b)
    * over a symbols array, as an index fold: state = (out, skip);
    * skip consumes the second element of a merged pair so overlapping
    * candidates ("a a a" under (a, a)) merge exactly floor(k/2) times. */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(
      sequence(lit(1), size(syms)),
      struct(array().cast("array<string>").as("out"), lit(false).as("skip")),
      (st, i) => {
        val cur = element_at(syms, i)
        val isMerge = (i < size(syms)) && (cur === lit(a)) &&
          (element_at(syms, i + 1) === lit(b))
        when(st.getField("skip"),
          struct(st.getField("out").as("out"), lit(false).as("skip")))
          .otherwise(when(isMerge,
            struct(concat(st.getField("out"), array(lit(a + b))).as("out"),
              lit(true).as("skip")))
            .otherwise(
              struct(concat(st.getField("out"), array(cur)).as("out"),
                lit(false).as("skip"))))
      },
      st => st.getField("out"))

  /** Learn `rounds` merges over the corpus' word-frequency table.
    * Returns (round, sym1, sym2, pairCount) in learning order. Initial
    * symbols are the word's characters plus the `</w>` end marker
    * (paper §3.2). Stops early if no pair remains (degenerate corpora). */
  def train(docs: DataFrame, textCol: String,
            rounds: Int): Seq[(Int, String, String, Long)] = {
    require(rounds >= 1, "need at least one merge round")
    var state = docs
      .select(explode(graft.functions.Text.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // chars via per-index substr (not split-on-empty-regex, whose
      // trailing-empty behavior differs between engines); + end marker
      .withColumn("syms", concat(
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))),
        array(lit("</w>"))))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val top = state.where(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("i"),
          col("syms"))
        .select(element_at(col("syms"), col("i")).as("a"),
          element_at(col("syms"), col("i") + 1).as("b"), col("freq"))
        .groupBy("a", "b").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges += ((r, a, b, c))
        state = state
          .withColumn("syms", mergePair(col("syms"), a, b))
          .localCheckpoint()
        r += 1
      }
    }
    merges.toSeq
  }

  /** Wrapped-symbol encoding delimiters: every symbol is carried as
    * ⟨sym⟩ (unit/record separators), so a literal `replace` of ⟨a⟩⟨b⟩
    * with ⟨ab⟩ is EXACTLY one greedy left-to-right non-overlapping merge
    * pass — the [[mergePair]] fold semantics — while symbol boundaries
    * make cross-symbol false matches impossible ("xth|e" can never match
    * the ("th","e") merge). Both engines' replace() scans left-to-right
    * and resumes after each replacement, so "aaa" under (a,a) merges
    * floor(3/2) times in both. Tokens containing the delimiter bytes
    * (U+001E/U+001F) would corrupt the framing; real text never carries
    * unit separators. */
  val Open = "\u001f"
  val Close = "\u001e"

  /** Apply a trained merge table to every document — the tokenizer's
    * inference half (train's output, or any shipped tokenizer artifact,
    * is the `merges` config). The corpus never re-encodes a word twice:
    * the DISTINCT word table (vocabulary-scale) is encoded map-side —
    * one chained literal-replace expression per merge, zero UDF — and
    * joined back to the exploded corpus on the word key; at 100 TB the
    * join is the only data-sized shuffle and the encode work is bounded
    * by the vocabulary, not the corpus.
    *
    * Returns (idCol, n_words, n_subwords, subwords_per_word).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol).as("id"),
        explode(graft.functions.Text.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
    val syms = concat(
      transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))),
      array(lit("</w>")))
    val encoded = merges.foldLeft(
      concat(lit(Open), array_join(syms, Close + Open), lit(Close))) {
      case (c, (a, b)) =>
        replace(c, lit(Open + a + Close + Open + b + Close),
          lit(Open + a + b + Close))
    }
    val vocab = words.select("word").distinct()
      .select(col("word"),
        (length(encoded) - length(replace(encoded, lit(Open), lit(""))))
          .as("n_sub"))
    words.join(vocab, "word")
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
      .select(col("id").as(idCol), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") / col("n_words"), 6)
          .as("subwords_per_word"))
  }
}
