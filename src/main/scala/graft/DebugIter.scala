package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic (NOT part of the driver contract, removed after
  * use): per-round wall breakdown of the PageRank transport over the
  * bucketed-table path vs the localCheckpoint-RDD path. */
object DebugIter {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "256m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dbg] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val name = Queries.stagedBucketedEdges(spark, d)
    val bucketed = spark.table(name).select(col("src"), col("dst"))
    val checkpointed = t("edges localCheckpoint") {
      bucketed.localCheckpoint()
    }

    for ((ctag, confs) <- Seq(
        "aqe32" -> Seq("spark.sql.adaptive.enabled" -> "true",
          "spark.sql.shuffle.partitions" -> "32"),
        "noaqe32" -> Seq("spark.sql.adaptive.enabled" -> "false",
          "spark.sql.shuffle.partitions" -> "32"),
        "aqe8" -> Seq("spark.sql.adaptive.enabled" -> "true",
          "spark.sql.shuffle.partitions" -> "8"),
        "noaqe8" -> Seq("spark.sql.adaptive.enabled" -> "false",
          "spark.sql.shuffle.partitions" -> "8"));
        (tag0, e) <- Seq("bucketed" -> bucketed, "rdd" -> checkpointed)) {
      val tag = s"$ctag/$tag0"
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      println(s"=== path: $tag ===")
      var state = t(s"$tag prInit+cut") {
        graft.graph.Graph.prInit(e)
          .withColumn("__prev", lit(null).cast("double")).localCheckpoint()
      }
      var it = 0
      var sum = 0.0
      while (it < 6) {
        val t0 = System.nanoTime()
        val next = graft.graph.Graph
          .prRound(state, e, 0.85, 0.15, trackDelta = true)
          .localCheckpoint()
        next.select(col("__delta")).take(1): Unit
        sum += (System.nanoTime() - t0) / 1e9
        state = next
        it += 1
      }
      println(f"[dbg] $tag%-20s mean round ${sum / 6}%7.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
