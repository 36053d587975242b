package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  * Brute-force cosine top-k as the exact baseline; LSH-bucketed ANN as
  * the scale path. All vector math via higher-order functions
  * (zip_with/aggregate) — codegen'd, no UDFs.
  */
object Similarity {

  /** Dot product of two array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn)
  }

  /** Exact top-k neighbors for each probe vector: probes (small) are
    * broadcast against the corpus; rank by (cosine desc, id) for a total
    * deterministic order. One broadcast join + one shuffle for the
    * per-probe top-k (rank window partitioned by probe).
    */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      probeIdCol: String, k: Int): DataFrame = {
    // norms are per-vector, not per-pair: compute them BEFORE the join
    // (cosine() inline would re-reduce both arrays for every candidate)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    val p = probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("__pv"),
      norm(col(vecCol)).as("__pn"))
    val scored = c.join(broadcast(p), col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos",
        when(col("__cn") * col("__pn") > 0,
          dot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Deterministic random-hyperplane sign sketch: plane p's component for
    * dimension i = md5-derived value in [-0.5, 0.5); bucket = integer of
    * sign bits. Deterministic across engines and runs (no RNG state).
    */
  def hyperplaneSketch(vec: Column, planes: Int): Column = {
    val dims = size(vec)
    val signs = (0 until planes).map { p =>
      // projection = sum_i v[i] * w(p, i)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), dims - 1), (v, i) => {
          val h = conv(substring(md5(concat(lit(p.toString), lit("_"), i.cast("string"))), 1, 8), 16, 10).cast("long")
          v.cast("double") * (h.cast("double") / lit(4294967296.0) - 0.5)
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    signs.reduce(_ + _)
  }

  /** IVF-style ANN: hyperplane sign buckets act as the coarse quantizer
    * and only the probe's own bucket is searched — a probe whose bucket
    * holds no corpus vectors returns no rows (recall/latency trade is
    * governed by `planes`: fewer planes = bigger buckets = higher recall).
    * Approximate — verified in tests against bruteForceTopK recall, not an
    * SQL oracle.
    */
  def lshTopK(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      probeIdCol: String, k: Int, planes: Int = 6): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"))
      .withColumn("bucket", hyperplaneSketch(col("__cv"), planes))
    val p = probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("__pv"),
        norm(col(vecCol)).as("__pn"))
      .withColumn("bucket", hyperplaneSketch(col("__pv"), planes))
    val scored = c.join(broadcast(p), Seq("bucket"))
      .where(col("neighbor_id") =!= col("probe_id"))
      .withColumn("cos",
        when(col("__cn") * col("__pn") > 0,
          dot(col("__cv"), col("__pv")) / (col("__cn") * col("__pn"))))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }
}
