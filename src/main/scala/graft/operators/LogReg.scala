package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic regression by full-batch gradient descent — the
  * quality-classifier trainer of a curation pipeline (the GPT-3 /
  * PaLM-era recipe: label a curated source positive, the raw crawl
  * negative, fit a linear classifier over cheap text-shape features,
  * keep documents the classifier scores curated-like; Brown et al.
  * 2020 §A use exactly this shape over tf-idf features). The reference
  * has no learned component — this extends the engine's supervised
  * tier beyond counting ([[Classify]] Naive Bayes) to gradient
  * training.
  *
  * Scale shape — the k-means/[[Pca]] regime: the MODEL is config-scale
  * (one weight per feature) and lives on the driver as literals; each
  * GD round is ONE corpus pass that partial-aggregates map-side down
  * to a single row (dims gradient components + loss + count), so per
  * round the shuffle carries O(dims) values per partition regardless
  * of corpus size, the weights never join anything, and the whole
  * scoring expression stays inside whole-stage codegen. `rounds`
  * passes total — full-batch GD's round count is a hyperparameter,
  * not data-dependent, so a SQL oracle unrolls it UNGATED.
  *
  * Determinism — the 6-dp-grid discipline ([[Pca]] for why 6 dp and
  * not 12): weights and features live on the 6-dp grid, so z =
  * Σ wᵢxᵢ (fixed left-associated order) is identical IEEE scalar
  * arithmetic on both engines; σ(z) and the per-row loss pass through
  * one transcendental (`exp`/`ln` agree across engines except on
  * sub-grid-resolution margins) and re-enter the grid at 6 dp;
  * gradient addends round to 12 dp and sum EXACTLY as fixed-point
  * longs ([[Pca]]'s codegen-friendly decimal twin — exact while
  * n·1e12 < 2^63, i.e. ~9e6 rows per aggregate at |addend| ≤ 1);
  * driver updates replay as HALF_UP BigDecimal rounding, the same
  * half-away-from-zero `round(x, 6)` both engines implement.
  */
object LogReg {

  /** A fitted model: `weights(i)` pairs with `xCols(i)`;
    * `lossTrace(r)` is the mean log-loss measured on round r+1's
    * PRE-update weights (so lossTrace.head is the loss of the zero
    * model, ln 2 for any data); `n` the training-row count. */
  final case class Fit(weights: IndexedSeq[Double],
                       lossTrace: IndexedSeq[Double], n: Long)

  /** Exact fixed-point sum of 12-dp-rounded addends, kept as the raw
    * scaled LONG (see [[Pca]] for the double-descaled twin): the driver
    * divides the exact integer itself, so the per-round mean is rounded
    * from the exact rational, not from a twice-rounded double. */
  private def sumFixed12Raw(c: Column): Column =
    sum(round(c * lit(1e12), 0).cast("long"))

  /** σ(z) clamped away from {0, 1} so the log-loss stays finite; both
    * the sigmoid and the clamp bounds are 6-dp-grid values. */
  private def clamp01(s: Column): Column =
    greatest(least(s, lit(0.999999)), lit(0.000001))

  /** The round-r scoring expression: σ(Σ wᵢxᵢ) on the 6-dp grid, with
    * the dot product folded in FIXED left-associated column order (the
    * oracle spells the identical chain, so both engines run the same
    * IEEE operation sequence). Weights are literals — scoring is
    * map-only, zero shuffles, wholly codegen'd. */
  def scoreExpr(weights: Seq[Double], xs: Seq[Column]): Column = {
    require(weights.size == xs.size, "one weight per feature column")
    val z = weights.zip(xs).map { case (w, x) => lit(w) * x }
      .reduceLeft(_ + _)
    round(lit(1.0) / (lit(1.0) + exp(-round(z, 6))), 6)
  }

  /** Fit by `rounds` full-batch GD steps from the zero vector.
    *
    * `df` must carry the feature columns `xCols` (each already on the
    * 6-dp grid — include an explicit all-ones bias column) and a 0/1
    * double label `yCol`. `lr` must be 2⁻ᵏ with k ∈ [0, 5] — not just
    * "exact in binary": the per-round gradient mean is rounded at
    * 6 − k decimals, so the step lr·gᵢ is an EXACT 6-dp decimal
    * (2⁻ᵏ·10⁻⁽⁶⁻ᵏ⁾ = 5ᵏ·10⁻⁶) and the update wᵢ − lr·gᵢ lands ON the
    * weight grid instead of on its half-boundary. This is load-bearing:
    * a first cut rounded g at 6 dp, which put every update with an
    * odd-last-digit gradient EXACTLY on the 5e-7 tie — a systematic
    * 50%-of-rounds coin flip between the engines' tie conventions
    * (JVM HALF_UP on the shortest decimal repr vs DuckDB's
    * nearbyint-after-scaling), observed as a 1e-6 weight split at
    * sf0.001 round 6. On-grid results make the tie unreachable; the
    * only rounding left (gᵢ/n itself) is taken on the EXACT rational
    * via BigDecimal, which agrees with the oracle's double-math round
    * unless the rational sits within a double ulp of the boundary.
    *
    * Per round, ONE aggregation job computes ∂L/∂wᵢ = Σ (σ(w·x) − y)·xᵢ
    * for every i plus the pre-update mean log-loss; the driver then
    * takes wᵢ ← wᵢ − lr·round₆₋ₖ(gᵢ/n) in exact decimal arithmetic.
    * The input is NOT cached here — callers training multiple epochs
    * over an expensive feature pipeline should checkpoint the feature
    * frame once (the q112 staging discipline). */
  def train(df: DataFrame, xCols: Seq[String], yCol: String,
            rounds: Int, lr: Double): Fit = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    require(xCols.nonEmpty, "logistic regression needs features")
    require(rounds >= 1, "need rounds >= 1")
    val k = (0 to 5).find(i => math.pow(2.0, -i) == lr)
      .getOrElse(throw new IllegalArgumentException(
        s"lr must be 2^-k with k in [0, 5], got $lr"))
    val gScale = 6 - k
    val lrBd = JBD.valueOf(lr)
    val scale12 = new JBD("1000000000000")
    val xs = xCols.map(col)
    val y = col(yCol)
    var w = IndexedSeq.fill(xCols.size)(JBD.ZERO.setScale(6))
    val trace = IndexedSeq.newBuilder[Double]
    var n = 0L
    var it = 0
    while (it < rounds) {
      val s = scoreExpr(w.map(_.doubleValue()), xs)
      val sc = clamp01(s)
      val nll = round(-(y * log(sc) + (lit(1.0) - y) * log(lit(1.0) - sc)), 6)
      val aggs = xCols.zipWithIndex.map { case (c, i) =>
        sumFixed12Raw((s - y) * col(c)).as(s"g$i")
      } :+ sumFixed12Raw(nll).as("lsum") :+ count(lit(1)).as("n")
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      n = row.getLong(xCols.size + 1)
      require(n > 0, "logistic regression got an empty training frame")
      val denom = scale12.multiply(JBD.valueOf(n))
      trace += new JBD(row.getLong(xCols.size))
        .divide(denom, 6, RoundingMode.HALF_UP).doubleValue()
      w = w.indices.map { i =>
        val g = new JBD(row.getLong(i))
          .divide(denom, gScale, RoundingMode.HALF_UP)
        w(i).subtract(lrBd.multiply(g)).setScale(6) // exact: on-grid step
      }
      it += 1
    }
    Fit(w.map(_.doubleValue()), trace.result(), n)
  }

  /** The 100 TB training path — [[train]] on a deterministic
    * [[Quantization.hashSample]] of the corpus (the
    * `trainCodebookSampled` convention: full-batch GD's gradient is a
    * mean, and a few hundred thousand rows estimate it to far below
    * the 6-dp step grid, so per-round cost becomes O(sample) while
    * SCORING still runs over everything). `idCol` must be a stable
    * row identity; the sample is a pure function of (id, pct, salt),
    * so retraining reproduces bit-for-bit. */
  def trainSampled(df: DataFrame, idCol: String, xCols: Seq[String],
                   yCol: String, rounds: Int, lr: Double,
                   pct: Int, salt: Int = 0): Fit =
    train(Quantization.hashSample(df, idCol, pct, salt),
      xCols, yCol, rounds, lr)
}
