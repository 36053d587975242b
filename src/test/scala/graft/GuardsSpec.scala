package graft

import graft.operators.Guards
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Guards contract is only a contract if it actually fires: a
  * single-partition series past the bound must FAIL the job, and the
  * constant partition key must survive Catalyst (no partition-less
  * window in the optimized plan). */
class GuardsSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed input: LocalRelation plans optimize differently and
  // would not exercise the constant-folding path that matters
  private def ranged(n: Int) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_guards").toString
    (1 to n).toDF("x").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("bounded column passes under the limit, fails past it") {
    val df = ranged(5)
    val w = Window.partitionBy(Guards.constKey(col("x"))).orderBy(col("x"))
    val ok = df.withColumn("r",
      Guards.bounded(row_number().over(w), col("x"), "spec", maxRows = 5))
    assert(ok.collect().map(_.getInt(1)).sorted.toSeq == (1 to 5))
    val bad = df.withColumn("r",
      Guards.bounded(row_number().over(w), col("x"), "spec", maxRows = 4))
    val e = intercept[Exception] { bad.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bounded single-partition series 'spec'")),
      s"wrong failure: $e")
  }

  test("constKey survives optimization: no partition-less window in the plan") {
    val df = ranged(5)
    val w = Window.partitionBy(Guards.constKey(col("x"))).orderBy(col("x"))
    val plan = df.withColumn("r", row_number().over(w))
      .queryExecution.optimizedPlan.toString
    // the partition key must still be there (a _w0 projection), not folded
    assert(plan.contains("pmod(hash(x"),
      s"constant partition key folded away:\n$plan")
  }
}
