package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Unit coverage for the corpus-prep operators beyond the q87-q89
  * oracles: chunk boundary arithmetic, contamination split hygiene,
  * OOV edge cases, and the chunker's no-shuffle plan guarantee.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: boundary arithmetic — overlap, short tail, exact fit, empty") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: chunks at 0,4,8
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, (1 to 8).map(i => s"x$i").mkString(" ")),  // exact two strides
      (4L, ""), (5L, "   ")                           // zero-token docs vanish
    ).toDF("doc_id", "text")
    val out = Corpus.chunk(docs, "doc_id", "text", chunkTokens = 6, stride = 4)
      .select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().toSeq.sorted
    assert(out == Seq(
      (1L, 0, 6, "t1 t2 t3 t4 t5 t6"),
      (1L, 1, 6, "t5 t6 t7 t8 t9 t10"),
      (1L, 2, 2, "t9 t10"),
      (2L, 0, 3, "a b c"),
      (3L, 0, 6, "x1 x2 x3 x4 x5 x6"),
      (3L, 1, 4, "x5 x6 x7 x8")))
  }

  test("chunk: every token lands in at least one chunk (stride <= chunk)") {
    val docs = Seq((1L, (1 to 97).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val covered = Corpus.chunk(docs, "doc_id", "text", 16, 11)
      .select(explode(split(col("chunk_text"), " ")).as("tok"))
      .distinct().count()
    assert(covered == 97L)
  }

  test("chunk: the plan has no shuffle — map-only at any scale") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Corpus.chunk(docs, "doc_id", "text", 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunk plan shuffles:\n$plan")
  }

  test("contamination: planted overlap found, self-split never contaminates") {
    val eight = "q w e r t y u i"
    val docs = Seq(
      (0L, s"$eight unique tail zero"),   // test (0 % 2 == 0)
      (2L, "totally different words here with no overlap at all"), // test
      (1L, s"$eight another train doc"),  // train: shares the 8-gram
      (3L, s"$eight third train copy")    // train: shares the same 8-gram
    ).toDF("doc_id", "text")
    val out = Corpus.contamination(docs, "doc_id", "text",
        col("doc_id") % 2 === 0, n = 8)
      .as[(Long, Long, Long, Long, Double)].collect().toMap2
    assert(out(0L)._2 == 1L && out(0L)._3 == 2L) // one shared 8-gram, 2 sources
    assert(out(2L)._2 == 0L && out(2L)._3 == 0L && out(2L)._4 == 0.0)
  }

  test("vocabOov: OOV rate against the top-K vocabulary; empty doc is 0") {
    val docs = Seq(
      (1L, "a a a b b c"), // with topK=2 vocab {a,b}: c is OOV -> 1/6
      (2L, "a b a b"),     // fully in-vocab
      (3L, "")             // zero tokens
    ).toDF("doc_id", "text")
    val out = Corpus.vocabOov(docs, "doc_id", "text", topK = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((6L, 1L, 0.166667)))
    assert(out(2L) == ((4L, 0L, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0)))
  }

  test("spanDedup: cross-doc spans flagged, within-doc repeats are not dups") {
    import spark.implicits._
    // spans of 3 tokens: docs 1 and 2 share their first span verbatim;
    // doc 3 repeats ITS OWN span twice (not a cross-doc dup); doc 4 unique
    val df = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c q r s"),
      (3L, "m n o m n o"),
      (4L, "u v w")
    ).toDF("doc_id", "text")
    val out = graft.operators.Corpus.spanDedup(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)), "self-repetition is not a cross-doc dup")
    assert(out(4L) == ((1L, 0L, 0.0)))
  }

  test("lineClean: C4 line rules — punctuation, length, word count") {
    val page = Seq(
      "This line is long enough and properly ends with a period.", // kept
      "No terminal punctuation on this sufficiently long line here", // no punct
      "Short line.",                                    // < 30 chars
      "home | about | contact | search | login | register | help", // no punct
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa.",      // 1 word < 3
      "  Trailing spaces after the final question mark stay fine?  " // kept
    ).mkString("\n")
    val out = Corpus.lineClean(Seq((1L, page)).toDF("id", "text"), "text")
      .select("n_lines", "n_kept", "cleaned")
      .as[(Int, Int, String)].collect()(0)
    assert(out._1 == 6 && out._2 == 2, s"got $out")
    assert(out._3.startsWith("This line") && out._3.contains("question mark"))
  }

  test("lineClean: the plan has no shuffle — map-only at any scale") {
    val docs = Seq((1L, "line one.\nline two")).toDF("doc_id", "text")
    val plan = Corpus.lineClean(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"lineClean plan shuffles:\n$plan")
  }

  test("lineClean: empty text and all-boilerplate pages survive as empty") {
    val out = Corpus.lineClean(
        Seq((1L, ""), (2L, "nav | nav\nnav | nav")).toDF("id", "text"), "text")
      .select("id", "n_kept", "cleaned").as[(Long, Int, String)]
      .collect().toMap2b
    assert(out(1L) == ((0, "")))
    assert(out(2L) == ((0, "")))
  }

  test("duplicateSpans: island merge recovers the maximal span at any offset") {
    // docs 1 and 2 share a 12-token run, at offset 3 in doc 1 and offset 0
    // in doc 2 — q105's aligned non-overlapping spans can miss this; the
    // island merge must report exactly ONE span of 12 tokens in each doc.
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a b c $shared x y"),
      (2L, s"$shared p q r"),
      (3L, "u v w entirely unique tokens here nothing shared at all")
    ).toDF("doc_id", "text")
    val out = Corpus.duplicateSpans(docs, "doc_id", "text", k = 8)
      .select("doc_id", "n_spans", "dup_tokens", "n_tokens", "dup_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().toMap2
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1L, 12L, 17L, math.rint(12.0 / 17 * 1e6) / 1e6)))
    assert(out(2L) == ((1L, 12L, 15L, 0.8)))
  }

  test("duplicateSpans: two disjoint shared runs stay two spans") {
    val r1 = (1 to 9).map(i => s"p$i").mkString(" ")
    val r2 = (1 to 10).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, s"$r1 gap1 gap2 gap3 $r2"),
      (2L, s"$r2 mid1 mid2 mid3 mid4 $r1")
    ).toDF("doc_id", "text")
    val full = Corpus.duplicateSpans(docs, "doc_id", "text", k = 8)
      .select("doc_id", "n_spans", "dup_tokens", "n_tokens", "dup_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().toMap2
    assert(full.keySet == Set(1L, 2L))
    assert(full(1L)._1 == 2L && full(1L)._2 == 19L) // 9 + 10 dup tokens
    assert(full(2L)._1 == 2L && full(2L)._2 == 19L)
  }

  test("exciseDuplicateSpans: hand-solved surgery, overlap union, short docs") {
    // docs 1/2 share the 3-gram "a b c" -> excised from BOTH (symmetric);
    // doc 3 untouched; docs 4/5 are identical -> fully excised to '';
    // doc 6 is under k tokens -> no grams, untouched.
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "x y a b c z"),
      (3L, "unique text nothing shared"),
      (4L, "p q r"), (5L, "p q r"),
      (6L, "s t")
    ).toDF("doc_id", "text")
    val out = Corpus.exciseDuplicateSpans(docs, "doc_id", "text", k = 3)
      .select("doc_id", "n_tokens", "removed_tokens", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 6L, 3L, "d e f"), (2L, 6L, 3L, "x y z"),
      (3L, 4L, 0L, "unique text nothing shared"),
      (4L, 3L, 3L, ""), (5L, 3L, 3L, ""),
      (6L, 2L, 0L, "s t")))
  }

  test("exciseDuplicateSpans: overlapping islands excise their coverage union") {
    // doc 1's grams "a b c" and "b c d" are each duplicated (in different
    // partners) — coverage [0,3) U [1,4) must union to all 4 tokens
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c"), (3L, "b c d")
    ).toDF("doc_id", "text")
    val out = Corpus.exciseDuplicateSpans(docs, "doc_id", "text", k = 3)
      .select("doc_id", "removed_tokens", "clean_text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 4L, ""), (2L, 3L, ""), (3L, 3L, "")))
  }

  test("duplicateSpans: within-doc repetition alone is NOT corpus duplication") {
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run $run"), // same 8-gram twice in ONE doc only
      (2L, "completely different content with no overlap whatsoever ok")
    ).toDF("doc_id", "text")
    assert(Corpus.duplicateSpans(docs, "doc_id", "text", k = 8).count() == 0L)
  }

  test("fim: lossless three-part split, bounded geometry, plan map-only") {
    val docs = (1L to 60L).map(i =>
      (i, s"doc$i " + ("abcdefghij" * (2 + (i % 5).toInt)))).toDF("doc_id", "text")
    val out = Corpus.fim(docs, "doc_id", "text")
    val rows = out.join(docs, "doc_id")
      .select(col("doc_id"), col("prefix"), col("middle"), col("suffix"),
        col("fim_text"), col("text"))
      .collect()
    assert(rows.nonEmpty && rows.length < 60, "hash selection must be partial")
    rows.foreach { r =>
      val (p, m, sfx, fimT, t) = (r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5))
      assert(p + m + sfx == t, s"doc ${r.getLong(0)} not lossless")
      assert(p.nonEmpty && m.nonEmpty && sfx.nonEmpty)
      assert(p.length <= t.length / 3 && sfx.length <= t.length / 3)
      assert(fimT == s"<PRE>$p<SUF>$sfx<MID>$m")
    }
    // short docs are never split
    assert(Corpus.fim(Seq((1L, "tiny")).toDF("doc_id", "text"),
      "doc_id", "text").count() == 0)
    // map-only: no exchange anywhere in the transform's plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "fim must stay map-only")
  }

  private implicit class Tup3Ops(rows: Array[(Long, Int, String)]) {
    def toMap2b: Map[Long, (Int, String)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  private implicit class Tup5Ops(rows: Array[(Long, Long, Long, Long, Double)]) {
    def toMap2: Map[Long, (Long, Long, Long, Double)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
