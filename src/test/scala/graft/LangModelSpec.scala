package graft

import graft.operators.LangModel
import org.apache.spark.sql.functions._

/** Hand-solved add-one bigram model (the q115 oracle checks the data
  * path at scale; this pins the smoothing arithmetic on a corpus small
  * enough to verify by hand). */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private def r9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
  private def r6(x: BigDecimal): Double =
    x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bigramNll: hand-solved smoothing, OOV, and short-doc exclusion") {
    // reference slice = doc 1 only: toks [a b a b]
    //   unigrams a:2 b:2, V=2; bigrams "a b":2, "b a":1
    val docs = Seq(
      (1L, "a b a b", true),
      (2L, "a b", false),   // p(b|a) = (2+1)/(2+2) -> nll ln(4/3)
      (3L, "c c", false),   // fully OOV: p = (0+1)/(0+2) -> nll ln(2)
      (4L, "a", false)      // no bigram -> no row
    ).toDF("doc_id", "text", "ref")
    val out = LangModel.bigramNll(docs, "doc_id", "text", col("ref"))
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    val nlAB = r9(math.log(4.0 / 3.0)) // "a b"
    val nlBA = r9(math.log(2.0))       // "b a" and the OOV "c c"
    assert(out == Seq(
      (1L, 3L, r6((nlAB * 2 + nlBA) / 3)),
      (2L, 1L, r6(nlAB)),
      (3L, 1L, r6(nlBA))))
  }

  test("bigramNll: seen-bigram docs score lower than unseen-bigram docs") {
    val docs = Seq(
      (1L, "spark reads parquet fast", true),
      (2L, "spark reads parquet", false),
      (3L, "parquet reads spark", false) // same vocab, reversed bigrams
    ).toDF("doc_id", "text", "ref")
    val byId = LangModel.bigramNll(docs, "doc_id", "text", col("ref"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(byId(2L) < byId(3L))
  }
}
