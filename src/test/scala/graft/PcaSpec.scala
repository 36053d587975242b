package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** PCA power iteration: hand-solved covariance entries under the 12-dp
  * round-sum-round regime, dominant-eigenvector recovery on a matrix
  * with a known spectrum, and the malformed-vector filter. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covariance matches the hand-solved 6-dp-grid entries") {
    // vectors (1,0), (0,1), (1,1): mu = r6(2/3) = 0.666667;
    // E[x1^2] = 2/3 -> 0.666667, E[x1x2] = 1/3 -> 0.333333;
    // mu^2 = 0.444444888889 exactly (12 dp)
    val df = Seq(Array(1f, 0f), Array(0f, 1f), Array(1f, 1f),
        Array(9f) /* wrong length: must be ignored, not null-poison */)
      .toDF("embedding")
    val got = Pca.covariance(df, "embedding", dims = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(got === Map(
      (1, 1) -> 0.222222, (1, 2) -> -0.111112, (2, 1) -> -0.111112,
      (2, 2) -> 0.222222))
  }

  test("powerIteration recovers the dominant eigenvector and eigenvalue") {
    // literal full covariance diag(2, 1): PC1 = e1, lambda 2, ratio 2/3.
    // The off-axis residual contracts at (1/2)^rounds ~ 2.5e-4 after
    // 12 rounds from the near-uniform start.
    val cov = Seq((1, 1, 2.0), (1, 2, 0.0), (2, 1, 0.0), (2, 2, 1.0))
      .toDF("i", "j", "c")
    val got = Pca.powerIteration(cov, dims = 2, rounds = 12)
      .orderBy("dim").collect()
    val loadings = got.map(_.getDouble(1))
    assert(loadings(0) > 0.9999 && math.abs(loadings(1)) < 1e-3)
    assert(math.abs(got(0).getDouble(2) - 2.0) < 1e-5)
    assert(math.abs(got(0).getDouble(3) - 2.0 / 3.0) < 1e-5)
  }

  test("powerIteration mixes off-diagonal mass (symmetric expansion)") {
    // C = [[1, 1], [1, 1]]: eigenpairs (2, (1,1)/sqrt2), (0, (1,-1));
    // one round maps ANY positive start to span{(1,1)} exactly, so the
    // loadings land on the 6-dp image of 1/sqrt2 immediately
    val cov = Seq((1, 1, 1.0), (1, 2, 1.0), (2, 1, 1.0), (2, 2, 1.0))
      .toDF("i", "j", "c")
    val got = Pca.powerIteration(cov, dims = 2, rounds = 3)
      .orderBy("dim").collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - 0.7071068) < 1e-5)
    }
    assert(math.abs(got(0).getDouble(2) - 2.0) < 1e-5)
    assert(math.abs(got(0).getDouble(3) - 1.0) < 1e-5)
  }

  test("project scores are the hand-computed 6-dp dot products") {
    val df = Seq((1L, Array(1f, 2f)), (2L, Array(-0.5f, 0.25f)),
        (3L, Array(9f)) /* wrong length: dropped */)
      .toDF("id", "embedding")
    val got = Pca.project(df, "embedding", Seq(0.3, -0.2))
      .select("id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 1*0.3 + 2*(-0.2) = -0.1; -0.5*0.3 + 0.25*(-0.2) = -0.2
    assert(got === Map(1L -> -0.1, 2L -> -0.2))
  }

  test("the full pipeline is run-to-run deterministic") {
    val df = Seq.tabulate(40) { k =>
      Array.tabulate(4)(j => ((k * 7 + j * 3) % 11 - 5).toFloat / 10f)
    }.toDF("embedding")
    def run() = Pca.powerIteration(
        Pca.covariance(df, "embedding", dims = 4), dims = 4, rounds = 12)
      .orderBy("dim").collect().toSeq
    assert(run() === run())
  }
}
