package graft

import graft.operators.LogReg
import org.apache.spark.sql.functions._

/** Full-batch GD logistic regression: descent on separable data, the
  * zero-model starting loss (ln 2 on any data), 6-dp-grid determinism
  * across runs, and the exact-binary-lr contract. */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  // y = [x > 0], cleanly separable on one feature + bias
  private def toy = Seq(
    (1.0, 0.0, 0.0), (1.0, 0.1, 0.0), (1.0, 0.2, 0.0), (1.0, 0.3, 0.0),
    (1.0, 0.7, 1.0), (1.0, 0.8, 1.0), (1.0, 0.9, 1.0), (1.0, 1.0, 1.0))
    .toDF("x1", "x2", "y")

  test("round one measures the zero model at ln 2; loss then descends") {
    val fit = LogReg.train(toy, Seq("x1", "x2"), "y", rounds = 6, lr = 0.5)
    assert(fit.n === 8)
    assert(fit.lossTrace.head === 0.693147) // -ln(0.5) rounded 6 dp
    assert(fit.lossTrace.sliding(2).forall { case Seq(a, b) => b < a },
      s"loss must strictly descend on separable data: ${fit.lossTrace}")
    // the separating feature's weight is positive and dominates the bias
    assert(fit.weights(1) > 0 && fit.weights(1) > math.abs(fit.weights(0)))
  }

  test("training is bit-deterministic across runs") {
    val a = LogReg.train(toy, Seq("x1", "x2"), "y", rounds = 5, lr = 0.25)
    val b = LogReg.train(toy, Seq("x1", "x2"), "y", rounds = 5, lr = 0.25)
    assert(a.weights === b.weights)
    assert(a.lossTrace === b.lossTrace)
  }

  test("scoreExpr is the 6-dp sigmoid of the literal dot product") {
    val got = toy.select(
      LogReg.scoreExpr(Seq(-1.0, 2.0), Seq(col("x1"), col("x2"))).as("s"))
      .collect().map(_.getDouble(0))
    val want = Seq(0.0, 0.1, 0.2, 0.3, 0.7, 0.8, 0.9, 1.0).map { x2 =>
      val z = BigDecimal(-1.0 * 1.0 + 2.0 * x2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.toSeq === want)
  }

  test("lr must be an exact power of two") {
    intercept[IllegalArgumentException] {
      LogReg.train(toy, Seq("x1", "x2"), "y", rounds = 1, lr = 0.3)
    }
  }

  test("sampled training still separates and reproduces bit-for-bit") {
    // 400 rows, y = [x2 > 0.5]; a 50% hash sample of the ids must still
    // learn the positive separating weight, and resampling with the same
    // (pct, salt) is bit-identical
    val big = (1 to 400).map { i =>
      val x2 = (i % 100) / 100.0
      (i.toLong, 1.0, x2, if (x2 > 0.5) 1.0 else 0.0)
    }.toDF("id", "x1", "x2", "y")
    val a = LogReg.trainSampled(big, "id", Seq("x1", "x2"), "y",
      rounds = 6, lr = 0.5, pct = 50, salt = 3)
    val b = LogReg.trainSampled(big, "id", Seq("x1", "x2"), "y",
      rounds = 6, lr = 0.5, pct = 50, salt = 3)
    assert(a.weights === b.weights && a.n === b.n)
    assert(a.n > 100 && a.n < 300, s"50% sample took ${a.n}/400 rows")
    assert(a.weights(1) > 0 && a.weights(1) > math.abs(a.weights(0)))
    // and the sampled gradient tracks the full one: same sign structure
    val full = LogReg.train(big, Seq("x1", "x2"), "y", rounds = 6, lr = 0.5)
    assert(math.signum(a.weights(1)) == math.signum(full.weights(1)))
  }
}
