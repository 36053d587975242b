package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "table scan table join"),
    (2L, "stream window stream stream"),
    (3L, "nothing relevant here at all"),
    (4L, "table")
  ).toDF("doc_id", "text")

  test("bm25: matched docs only, tf monotone, hand-checked score") {
    val out = Curation.bm25(docs, "doc_id", "text", Seq("table", "stream"))
      .orderBy("doc_id").collect()
    // doc 3 has no query terms -> absent
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    val byId = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // N=4, avgdl = (4+4+5+1)/4 = 3.5; 'table' df=2 -> idf = ln(1+2.5/2.5)=ln 2
    // doc 4: tf=1, dl=1 -> ln(2) * 2.2/(1 + 1.2*(0.25 + 0.75/3.5))
    val expected4 = BigDecimal(math.log(2.0) *
      2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 1.0 / 3.5)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId(4L) == expected4)
    // doc 4 (tf=1 but dl=1) outranks doc 1 (tf=2, dl=4): BM25's length
    // normalization — the whole point of the b term
    assert(byId(4L) > byId(1L))
    // n_terms_matched
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L))
  }

  test("length histogram: integral buckets, cumulative share ends at 1") {
    val df = Seq((1L, "a"), (2L, "a b c"), (3L, "a b c d e f g"), (4L, ""))
      .toDF("doc_id", "text")
    val h = Curation.lengthHistogram(df, "text").orderBy("bucket").collect()
    // 1 token -> bucket 0; 3 -> 1; 7 -> 2; empty doc excluded
    assert(h.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(h.map(_.getLong(1)).toSeq == Seq(1L, 1L, 1L))
    assert(h.map(_.getLong(2)).toSeq == Seq(1L, 3L, 7L))
    assert(h.last.getDouble(4) == 1.0)
    assert(math.abs(h.head.getDouble(3) - 1.0 / 11.0) < 1e-6)
  }

  test("hash split: deterministic, content-addressed, all rows assigned") {
    val ids = spark.range(0, 1000).toDF("id")
    val a = ids.withColumn("s", Curation.hashSplit(col("id")))
    val counts = a.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 1000L)
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    // roughly 80/10/10 (md5 is uniform; wide tolerance, deterministic anyway)
    assert(counts("train") > 700 && counts("train") < 900)
    // stable across evaluations — same expression, same assignment
    val b = ids.withColumn("s", Curation.hashSplit(col("id")))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("topNPerGroup: keyed rank with total order") {
    val df = Seq(("g1", 1L, 0.9), ("g1", 2L, 0.9), ("g1", 3L, 0.5),
      ("g2", 4L, 0.1)).toDF("g", "id", "score")
    val top = Curation.topNPerGroup(df, Seq("g"),
      Seq(col("score").desc, col("id")), n = 2)
      .orderBy("g", "rk").collect()
    assert(top.map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSeq ==
      Seq(("g1", 1L, 1), ("g1", 2L, 2), ("g2", 4L, 1)))
  }

  test("incremental near-dup: exact and near tiers against the corpus") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val df = Seq(
      (10L, base),                        // corpus
      (20L, base + "extra trailing bit"), // corpus near-var
      (37L, base),                        // NEW: exact dup of 10
      (47L, base + "extra trailing bit"), // NEW: exact dup of 20, near of 10
      (57L, "completely different content about spark catalyst planning")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(df, "doc_id", "text",
        col("doc_id") % 10 === 7, maxHamming = 8)
      .orderBy("doc_id").collect()
    val m = out.map(r => r.getLong(0) ->
      ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(m(37L)._1, "exact dup must be flagged")
    assert(m(37L)._2 >= 1, "exact dup is also a near-dup (hamming 0)")
    assert(m(47L)._1, "exact dup of the corpus variant")
    assert(!m(57L)._1 && m(57L)._2 == 0L, "unrelated doc matches nothing")
  }

  test("dsirWeights: all-target corpus scores exactly zero everywhere") {
    // target == raw -> ct == cr per bucket -> every log-ratio is 0
    val df = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    val out = Curation.dsirWeights(df, "doc_id", "text", lit(true))
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 3L, 0.0), (2L, 2L, 0.0)))
  }

  test("dsirWeights: target-exclusive tokens outweigh raw-only tokens") {
    val df = Seq(
      (1L, "alpha alpha alpha", true),
      (2L, "beta beta beta", false)
    ).toDF("doc_id", "text", "t")
    val byId = Curation.dsirWeights(df, "doc_id", "text", col("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 1's tokens appear in the target slice, doc 2's never do
    assert(byId(1L) > 0.0 && byId(2L) < 0.0 && byId(1L) > byId(2L))
  }

  test("gopherFlags: each published rule trips on its crafted violation") {
    val good = ("the fox and dog run fast " * 10).trim // 60 words; the+and distinct
    val docs = Seq(
      (1L, good),
      (2L, "the and fox dog"),                      // too few words
      (3L, ("x# " * 60).trim),                      // hash ratio 1.0
      (4L, "- item one\n- item two\n- item three"), // all bullet lines
      (5L, "more to come...\nand then...\nwait..."),// all ellipsis lines
      (6L, "111 222 333 444"),                      // no alphabetic words
      (7L, "fox dog cat bird"),                     // no stopwords
      // ONE Gopher stopword repeated: >= 2 occurrences but only 1
      // DISTINCT — the paper's containment semantics must fail it
      (8L, "the the the fox"),
      // separate symbol thresholds: hash 3/50 = 0.06 and ellipsis
      // 3/50 = 0.06 each pass 0.1, though the combined 0.12 would not
      (9L, ("fox " * 44).trim + " a# b# c# d... e... f...")
    ).toDF("doc_id", "text")
    val f = Curation.gopherFlags(docs, "text")
      .select("doc_id", "r_words", "r_meanlen", "r_symbol", "r_bullet",
        "r_ellipsis", "r_alpha", "r_stop", "pass_all")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getBoolean(8), "the clean 60-word doc passes every rule")
    assert(!f(2L).getBoolean(1) && f(2L).getBoolean(7), "short doc fails words only of these")
    assert(!f(3L).getBoolean(3), "hash-mark doc fails the symbol ratio")
    assert(!f(4L).getBoolean(4), "bullet-lines doc fails the bullet rule")
    assert(!f(5L).getBoolean(5), "ellipsis-lines doc fails the ellipsis rule")
    assert(!f(6L).getBoolean(6), "digit doc fails the alpha-word rule")
    assert(!f(7L).getBoolean(7), "stopword-free doc fails the stopword rule")
    assert(!f(8L).getBoolean(7), "repeated single stopword is NOT two distinct")
    assert(f(9L).getBoolean(3), "0.06 + 0.06 symbol ratios pass separate thresholds")
    assert(Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L).forall(id => !f(id).getBoolean(8)))
  }

  test("jsDivergence: identical slices read 0; disjoint slice matches closed form") {
    // two slices with the same token distribution == the corpus distribution
    val same = Seq(("a", "x x y"), ("b", "x x y"))
      .toDF("slice", "text")
    val rSame = Curation.jsDivergence(same, "slice", "text")
      .select("slice", "n_tokens", "n_types", "jsd")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rSame.forall { case (_, (n, t, j)) => n == 3L && t == 2L && j == 0.0 })

    // slice {a a a} vs corpus {a a a, b b b}: closed form
    //   0.5·1·log2(2/1.5) + 0.5·0.5·log2(1/1.5) + 0.5·(1-0.5) = 0.311278
    val disj = Seq(("s1", "aa aa aa"), ("s2", "bb bb bb")).toDF("slice", "text")
    val r = Curation.jsDivergence(disj, "slice", "text")
      .select("slice", "jsd").as[(String, Double)].collect().toMap
    assert(math.abs(r("s1") - 0.311278) < 1e-6)
    assert(math.abs(r("s2") - 0.311278) < 1e-6)
  }

  test("jsDivergence: bounded in [0, 1] and covers every slice") {
    val docs = Seq(
      ("en", "the quick brown fox jumps over the lazy dog"),
      ("en", "the rain in spain stays mainly in the plain"),
      ("de", "der schnelle braune fuchs springt"),
      ("fr", "le renard brun rapide saute par dessus")
    ).toDF("slice", "text")
    val out = Curation.jsDivergence(docs, "slice", "text")
      .select("slice", "jsd").as[(String, Double)].collect().toMap
    assert(out.keySet == Set("en", "de", "fr"))
    assert(out.values.forall(j => j >= 0.0 && j <= 1.0))
  }
}
