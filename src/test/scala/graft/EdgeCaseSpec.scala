package graft

import graft.functions.Text
import graft.operators.Joins
import graft.sources.FixedWidth
import graft.sources.FixedWidth.ColSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Regression tests for the edge cases found in review: they pin the fixed
  * behavior so it cannot silently regress. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoinBackward: NULL keys never match") {
    val left = Seq((Option.empty[Long], ts("2024-01-01 10:00:00"), "nullkey"),
      (Some(1L), ts("2024-01-01 10:00:00"), "match"))
      .toDF("k", "t", "tag")
    val right = Seq((Option.empty[Long], ts("2024-01-01 09:00:00"), 1.0),
      (Some(1L), ts("2024-01-01 09:00:00"), 2.0))
      .toDF("k", "rt", "p")
    val out = Joins.asOfJoinBackward(left, right, Seq("k"), "t", "rt", Seq("p"))
      .orderBy("tag").select("p").collect()
    assert(out(0).getDouble(0) == 2.0) // real key matches
    assert(out(1).isNullAt(0))         // null key must NOT match null key
  }

  test("asOfJoinBackward: null payload cells stay atomic (no row mixing)") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), Some(5.0), Some(7.0)),
      (1L, ts("2024-01-01 10:00:00"), Option.empty[Double], Some(9.0)))
      .toDF("k", "rt", "a", "b")
    val out = Joins.asOfJoinBackward(left, right, Seq("k"), "t", "rt", Seq("a", "b"))
      .select("a", "b").collect()(0)
    // latest row is (null, 9.0) — 'a' must NOT be backfilled from the older row
    assert(out.isNullAt(0) && out.getDouble(1) == 9.0)
  }

  test("fixed-width writer raises on field overflow instead of truncating") {
    val specs = Seq(ColSpec("x", 1, 3, LongType))
    val df = Seq(12345L).toDF("x").select(FixedWidth.formatLine(specs).as("value"))
    val e = intercept[Exception] { df.collect() }
    assert(e.getMessage.contains("fixed-width overflow") ||
      e.getCause != null && e.getCause.getMessage.contains("fixed-width overflow"))
  }

  test("tokens: null text yields zero tokens, not null") {
    val df = Seq(Option.empty[String], Some("a b")).toDF("t")
    val out = df.select(Text.tokenCount(col("t"))).as[Int].collect()
    assert(out.toSeq == Seq(0, 2))
  }

  test("sessionize: sub-second gap at the threshold boundary is fractional") {
    import graft.operators.Windows
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00.900"), 1L),
      // 89.997 min later: whole-second truncation would read 90.0 and split
      (1L, new Timestamp(Timestamp.valueOf("2024-01-01 10:00:00.900").getTime + 5399800L), 2L)
    ).toDF("user_id", "ts", "event_id")
    val out = Windows.sessionize(df, Seq("user_id"), "ts", Seq("event_id"), 90.0)
      .select("session_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 1L), "fractional gap below threshold must not split")
  }

  test("winnowing guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    val shared = "the quick brown fox jumps over it"
    val df = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"completely different start $shared other tail")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), Text.winnowFingerprints(col("text"), 8, 4).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
  }

  test("curation edge cases: empty/degenerate inputs produce empty, not errors") {
    import graft.operators.{Curation, Corpus, Dedup}
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.bm25(empty, "doc_id", "text", Seq("x")).count() == 0)
    assert(Curation.lengthHistogram(empty, "text").count() == 0)
    assert(Corpus.spanDedup(empty, "doc_id", "text", 4).count() == 0)
    // all-empty/null texts: no spans, no histogram rows, no bm25 rows
    val blank = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "   "))
      .toDF("doc_id", "text")
    assert(Curation.bm25(blank, "doc_id", "text", Seq("x")).count() == 0)
    assert(Curation.lengthHistogram(blank, "text").count() == 0)
    assert(Corpus.spanDedup(blank, "doc_id", "text", 4).count() == 0)
    // hashSplit on negative ids: md5 of the SIGNED decimal string, total
    val neg = Seq(-5L, -1L, 0L, 7L).toDF("id")
      .withColumn("s", Curation.hashSplit(col("id")))
    assert(neg.where(col("s").isin("train", "val", "test")).count() == 4)
    // incremental dedup with an EMPTY corpus: nothing can be a dup
    val out = Dedup.incrementalNearDup(
        Seq((7L, "some new content here")).toDF("doc_id", "text"),
        "doc_id", "text", lit(true))
      .collect()
    assert(out.length == 1 && !out(0).getBoolean(1) && out(0).getLong(2) == 0L)
  }

  test("round-5 curation edge cases: degenerate text and slices") {
    import graft.operators.{Curation, LangModel, Packing}
    // gopherFlags on empty/null/blank text: no division error, and
    // pass_all is a NON-NULL false (the null-text line rules go null,
    // but the conjunction short-circuits on the false word-count rule);
    // the word/stopword rules themselves stay non-null false
    val blank = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "   "))
      .toDF("doc_id", "text")
    val flags = Curation.gopherFlags(blank, "text")
      .select("doc_id", "pass_all", "r_words", "r_stop").collect()
    assert(flags.length == 3 && flags.forall(r =>
      !r.isNullAt(1) && !r.getBoolean(1) &&
        !r.isNullAt(2) && !r.getBoolean(2) &&
        !r.isNullAt(3) && !r.getBoolean(3)))
    // dsirWeights on empty input: empty output, no error
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.dsirWeights(emptyDocs, "doc_id", "text", lit(true)).count() == 0)
    // bigramNll with an EMPTY reference slice: vocab 0 -> p = 1/0 ->
    // the 9-dp decimal cast of -log(Inf) is null; scoring must not
    // throw and n_bigrams stays honest
    val docs = Seq((1L, "a b c", false), (2L, "x", false))
      .toDF("doc_id", "text", "ref")
    val nll = LangModel.bigramNll(docs, "doc_id", "text", col("ref"))
      .orderBy("doc_id").collect()
    assert(nll.length == 1 && nll(0).getLong(1) == 2L && nll(0).isNullAt(2))
    // zipperPack singleton shard: one pair of one doc, padding = cap - len
    val one = Seq((1L, 30)).toDF("doc_id", "n_tokens")
    val z = Packing.zipperPack(one, "doc_id", "n_tokens", 1, 50).collect()
    assert(z.length == 1 && z(0).getAs[Long]("n_docs") == 1L &&
      z(0).getAs[Long]("padding") == 20L && z(0).getAs[Long]("overflow") == 0L)
  }

  test("tableDiff: added/removed/changed/unchanged, nulls diff like values") {
    import graft.operators.Reshape
    val before = Seq((1L, Some(10.0), "x"), (2L, Some(20.0), "y"),
      (3L, None, "z"), (4L, Some(40.0), "w")).toDF("k", "v", "s")
    val after = Seq((1L, Some(10.0), "x"),      // unchanged
      (2L, Some(21.0), "y"),                    // changed value
      (3L, Some(30.0), "z"),                    // null -> value = changed
      (5L, Some(50.0), "n")                     // added; 4 removed
    ).toDF("k", "v", "s")
    val got = Reshape.tableDiff(before, after, Seq("k"), Seq("v", "s"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("betweennessSampled: zero matching seeds is an empty result, not a crash") {
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val out = graft.graph.Graph.betweennessSampled(e,
      _ => org.apache.spark.sql.functions.lit(false), maxHops = 4)
    assert(out.count() == 0)
  }

  test("neighborhoodFunction: isolated-free empty graph degrades to zero rows per hop") {
    val e = spark.emptyDataFrame
      .select(org.apache.spark.sql.functions.lit("x").as("src"),
        org.apache.spark.sql.functions.lit("y").as("dst"))
      .where(org.apache.spark.sql.functions.lit(false))
    val out = graft.graph.Graph.neighborhoodFunction(e, k = 4, maxHops = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1, 0L, 0.0), (2, 0L, 0.0)))
  }
}
