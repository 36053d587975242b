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
}
