package graft

import graft.operators.Quantization
import org.apache.spark.sql.functions._

/** Hand-solved PQ encode/ADC arithmetic (the q119 oracle checks the
  * data path at scale; this pins the subspace argmin, tie-break, and
  * table-lookup semantics on vectors small enough to verify by hand). */
class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  // dims=4, M=2 subspaces of 2; K=2 codewords
  private val cb = IndexedSeq(
    IndexedSeq(0.0, 0.0, 10.0, 10.0),
    IndexedSeq(1.0, 1.0, -10.0, -10.0))

  test("pqCodes: per-subspace argmin with tie to the smaller code") {
    val df = Seq(
      (1L, Seq(0.1f, 0.0f, -9.0f, -9.0f)), // sub1 -> cw0, sub2 -> cw1
      (2L, Seq(0.9f, 1.1f, 9.0f, 9.0f)),   // sub1 -> cw1, sub2 -> cw0
      (3L, Seq(0.5f, 0.5f, 10.0f, 10.0f))  // sub1 EQUIDISTANT -> cw0
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
        Quantization.pqCodes(col("embedding"), cb, m = 2, dims = 4).as("codes"))
      .orderBy("vec_id").as[(Long, Seq[Int])].collect().toSeq
    assert(out == Seq((1L, Seq(0, 1)), (2L, Seq(1, 0)), (3L, Seq(0, 0))))
  }

  test("adcTable + adcScore: table lookups reproduce codeword distances") {
    val query = IndexedSeq(1.0, 0.0, 0.0, 0.0)
    val table = Quantization.adcTable(query, cb, m = 2)
    // d(q_sub1, cw0_sub1) = 1, d(q_sub1, cw1_sub1) = 0+1 = 1
    // d(q_sub2, cw0_sub2) = 200, d(q_sub2, cw1_sub2) = 200
    assert(table == IndexedSeq(IndexedSeq(1.0, 1.0), IndexedSeq(200.0, 200.0)))
    val df = Seq((1L, Seq(0.1f, 0.0f, -9.0f, -9.0f))).toDF("vec_id", "embedding")
    val out = df.select(
        Quantization.adcScore(
          Quantization.pqCodes(col("embedding"), cb, 2, 4), table).as("a"),
        round(Quantization.exactDist(col("embedding"), query), 6).as("e"))
      .as[(Double, Double)].collect().head
    // codes [0,1]: approx = 1.0 + 200.0; exact = 0.9^2 + 0 + 81 + 81
    assert(out._1 == 201.0)
    assert(math.abs(out._2 - 162.81) < 1e-6)
  }

  test("initCodebook is the k smallest ids in order") {
    val df = Seq((5L, Seq(5f, 5f)), (1L, Seq(1f, 1f)), (3L, Seq(3f, 3f)))
      .toDF("vec_id", "embedding")
    val got = Quantization.initCodebook(df, "vec_id", "embedding", 2)
    assert(got == IndexedSeq(IndexedSeq(1.0, 1.0), IndexedSeq(3.0, 3.0)))
  }

  test("persisted codes table scores without the vectors (the index shape)") {
    // the 100 TB story: encode once, persist the (id, codes) table, and
    // answer ADC queries from the codes alone — embeddings never rescan
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_index").toString
    val vecs = Seq(
      (1L, Seq(0.1f, 0.0f, -9.0f, -9.0f)),
      (2L, Seq(0.9f, 1.1f, 9.0f, 9.0f)),
      (3L, Seq(0.5f, 0.5f, 10.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    vecs.select(col("vec_id"),
        Quantization.pqCodes(col("embedding"), cb, 2, 4).as("codes"))
      .write.mode("overwrite").parquet(dir)
    val table = Quantization.adcTable(IndexedSeq(1.0, 0.0, 0.0, 0.0), cb, 2)
    val direct = vecs.select(col("vec_id"),
        Quantization.adcScore(
          Quantization.pqCodes(col("embedding"), cb, 2, 4), table).as("a"))
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    val fromIndex = spark.read.parquet(dir)
      .select(col("vec_id"), Quantization.adcScore(col("codes"), table).as("a"))
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    assert(fromIndex == direct && direct.size == 3)
  }
}
