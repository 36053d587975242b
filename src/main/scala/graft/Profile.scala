package graft

import graft.functions.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = Tables.documents(spark, d)
      .withColumn("block", substring(Text.normalize(col("text")), 1, 16))

    val sets = docs.select(col("block"), col("doc_id").as("id"),
        array_distinct(Text.wordShingles(col("text"), 3)).as("sh"))
      .where(size(col("sh")) > 0)

    time("sets only")(sets.write.mode("overwrite").format("noop").save())
    time("sets repart")(sets.repartition(col("block")).write.mode("overwrite").format("noop").save())

    val s2 = sets.repartition(col("block"))
    val a = s2.as("a"); val b = s2.as("b")
    val joined = a.join(b, col("a.block") === col("b.block") && col("a.id") < col("b.id"))
    time("join only")(joined.select(col("a.id"), col("b.id")).write.mode("overwrite").format("noop").save())
    val full = joined.select(col("a.id").as("id1"), col("b.id").as("id2"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double").as("inter"),
        size(col("a.sh")).as("size1"), size(col("b.sh")).as("size2"))
    time("join+intersect")(full.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
