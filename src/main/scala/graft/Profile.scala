package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract): runs the
  * named queries N times each and prints per-iteration wall times, to
  * separate JIT/codegen warmup from steady state. */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSet else Set("q01_ruleagg_basic")
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
    val unknown = names -- Queries.all.map(_.name).toSet
    if (unknown.nonEmpty) {
      System.err.println(s"[prof] unknown query names: ${unknown.mkString(", ")}")
      sys.exit(1)
    }
    Queries.all.filter(q => names.contains(q.name)).foreach { q =>
      val times = (1 to sys.env.getOrElse("SPARK_GRAFT_PROF_N", "3").toInt).map { _ =>
        val t0 = System.nanoTime()
        q.run(spark, d).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // Bench parity: iterative operators leak localCheckpoint blocks the
        // caller can't release — without the clear, iteration k is billed
        // iteration k-1's cache pressure (measured q191 35.3 s first
        // iteration vs 9.3 s second purely from leaked blocks)
        spark.catalog.clearCache()
        dt
      }
      println(f"[prof] ${q.name}%-28s ${times.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
