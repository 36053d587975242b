package graft

import graft.operators.Classify
import org.apache.spark.sql.functions._

/** Multinomial NB semantics on a hand-checkable fixture: smoothed
  * likelihoods steer a token toward its majority class, priors decide
  * token-free documents, unseen tokens fall back per-class, ties break
  * to the larger label. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val train = Seq(
    ("spam spam offer", "spam"),
    ("spam offer now", "spam"),
    ("spam deal", "spam"),
    ("meeting notes today", "ham"),
    ("notes for the meeting", "ham")).toDF("text", "label")

  test("token evidence beats the prior; prior decides empty documents") {
    val model = Classify.nbTrain(train, "text", "label")
    assert(model.labels == Seq("ham", "spam"))
    val docs = Seq(
      (1L, "spam offer"),      // spam tokens
      (2L, "meeting notes"),   // ham tokens
      (3L, ""),                // no tokens: prior only -> spam (3/5 docs)
      (4L, "zzz qqq")          // all unseen: priors + unseen defaults
    ).toDF("doc_id", "text")
    val preds = Classify.nbPredict(docs, "doc_id", "text", model)
      .as[(Long, String)].collect().toMap
    assert(preds(1L) == "spam")
    assert(preds(2L) == "ham")
    assert(preds(3L) == "spam")
    // unseen-only docs: spam has the larger prior AND its unseen default
    // is computed from ITS token total — verify against hand math:
    // score_l = prior_l + 2 * ln(1/(n_toks_l + V))
    val bd = (s: String) => (model.prior(s).doubleValue,
      model.unseen(s).doubleValue)
    val (ps, us) = bd("spam"); val (ph, uh) = bd("ham")
    val expect = if (ps + 2 * us >= ph + 2 * uh) "spam" else "ham"
    assert(preds(4L) == expect)
  }

  test("likelihoods are add-one smoothed over the joint vocabulary") {
    val model = Classify.nbTrain(train, "text", "label")
    // V = distinct tokens across both classes; spam has 8 tokens total
    val v = train.select(explode(graft.functions.Text.tokens(col("text"))))
      .distinct().count()
    val spamToks = 8L
    // "spam" appears 4 times in class spam -> ln((4+1)/(8+V))
    val lik = model.tokLikWide.where(col("tok") === "spam")
      .select(col("llik_spam")).as[java.math.BigDecimal].head()
    val got = BigDecimal(lik)
    val exp = BigDecimal(math.log(5.0 / (spamToks + v)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(got == exp, s"llik(spam|spam) $got != $exp")
  }
}
