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

  test("aucExact: perfect, random-tied, and hand-solved mixed cases") {
    def auc(rows: Seq[(Double, Int)]): (Long, Long, Double) = {
      val r = Classify.aucExact(rows.toDF("s", "y"), col("s"), col("y"))
        .head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    // perfect separation
    assert(auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))) ==
      (2L, 2L, 1.0))
    // inverted scorer
    assert(auc(Seq((0.1, 1), (0.2, 0)))._3 == 0.0)
    // all scores tied -> midranks make AUC exactly 0.5
    assert(auc(Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)))._3 == 0.5)
    // hand-solved: scores 1..4 with labels 0,1,0,1 ->
    // pairs won 2+1 of 4 -> AUC = 0.75
    assert(auc(Seq((1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)))._3 == 0.75)
  }

  test("calibrationDeciles: equal-frequency bins, tied groups stay whole") {
    // 100 distinct probs -> 10 bins of 10; positives only in the top
    val rows = (1 to 100).map(i => (i / 100.0, if (i > 90) 1 else 0))
    val out = Classify.calibrationDeciles(rows.toDF("p", "y"),
        col("p"), col("y")).orderBy(col("bin")).collect()
    assert(out.length == 10 && out.forall(_.getLong(1) == 10L))
    assert(out.last.getDouble(3) == 1.0 &&
      out.take(9).forall(_.getDouble(3) == 0.0))
    // one giant tied group must land in ONE bin (group stays whole)
    val tied = Seq.fill(30)((0.5, 0)) ++ Seq((0.9, 1))
    val t = Classify.calibrationDeciles(tied.toDF("p", "y"),
      col("p"), col("y")).orderBy(col("bin")).collect()
    assert(t.length == 2 && t.head.getLong(1) == 30L &&
      t.last.getLong(1) == 1L)
  }

  test("calibrationBins: both ends clamped, means are hand-exact") {
    // p = 1.0 belongs to the TOP bin (not a phantom bin 10); a
    // mis-scaled scorer feeding p < 0 lands in bin 0 instead of
    // minting a negative bin id that silently skews the diagram
    val rows = Seq((-0.2, 0), (0.0, 0), (0.05, 1), (0.95, 1), (1.0, 1))
    val out = Classify.calibrationBins(rows.toDF("p", "y"),
        col("p"), col("y"), bins = 10).orderBy(col("bin")).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 9))
    // frac_pos rides pround(1/3, 6); mean_pred is decimal-exact
    val lo = out.head
    assert(lo.getLong(1) == 3L && lo.getDouble(2) == -0.05 &&
      lo.getDouble(3) == 0.333333)
    val hi = out.last
    assert(hi.getLong(1) == 2L && hi.getDouble(2) == 0.975 &&
      hi.getDouble(3) == 1.0)
  }
}
