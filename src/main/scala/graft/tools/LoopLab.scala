package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch lab (not part of the driver contract) for the converged-loop
  * transport experiments (r10 verdict item 6): times q182's converged
  * PageRank shape under different per-round planning regimes in ONE
  * session, so the variants are a same-session A/B. Prints median wall
  * seconds and the (iters, l1_delta) pair per variant — any variant
  * whose stop readout differs from base is a bug, not an optimization.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.LoopLab base coalesce_off sp8 static static_shj"
  */
object LoopLab {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val variants = if (args.nonEmpty) args.toSeq else Seq("base")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
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

    // SPARK_GRAFT_LAB_COPIES=10 rebuilds the sf1 probe's volume shape:
    // key-shifted customer copies over the same suppliers (deepens the
    // supplier-hub skew instead of cloning disjoint graphs)
    val copies = sys.env.getOrElse("SPARK_GRAFT_LAB_COPIES", "1").toInt
    def edges = {
      val base = graft.Tables.table(spark, d, "orders")
        .join(graft.Tables.table(spark, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("l_suppkey"))
      if (copies <= 1)
        base.select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      else base.distinct()
        .select(explode(sequence(lit(0), lit(copies - 1))).as("copy"),
          col("o_custkey"), col("l_suppkey"))
        .select(concat(lit("c"), col("copy"), lit("_"), col("o_custkey"))
          .as("src"), concat(lit("s"), col("l_suppkey")).as("dst"))
    }

    def withConf[T](kvs: (String, String)*)(body: => T): T = {
      val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    def run(): (Double, String) = {
      val t0 = System.nanoTime()
      val out = graft.graph.Graph.pageRankConverged(edges, tol = 0.02,
        maxIter = 30)
      out.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val stop = out.select("iters", "l1_delta").limit(1).collect()(0)
      spark.catalog.clearCache()
      (dt, s"iters=${stop.get(0)} delta=${stop.get(1)}")
    }

    variants.foreach { v =>
      val samples = (1 to 3).map { _ =>
        v match {
          case "base" => run()
          case "coalesce_off" => withConf(
            "spark.sql.adaptive.coalescePartitions.enabled" -> "false")(run())
          case "sp8" => withConf("spark.sql.shuffle.partitions" -> "8")(run())
          case "sp4" => withConf("spark.sql.shuffle.partitions" -> "4")(run())
          case "sp2" => withConf("spark.sql.shuffle.partitions" -> "2")(run())
          case "shj_sp8" => withConf(
            "spark.graft.iterative.shjHints" -> "true",
            "spark.sql.shuffle.partitions" -> "8")(run())
          case "sp8_coalesce_off" => withConf(
            "spark.sql.shuffle.partitions" -> "8",
            "spark.sql.adaptive.coalescePartitions.enabled" -> "false")(run())
          case "static" =>
            graft.operators.IterPlan.withLoopPlanning(spark)(run())
          case "static_shj" => withConf(
            "spark.graft.iterative.shjHints" -> "true")(
            graft.operators.IterPlan.withLoopPlanning(spark)(run()))
          case "static_shj_sp8" => withConf(
            "spark.graft.iterative.shjHints" -> "true",
            "spark.sql.shuffle.partitions" -> "8")(
            graft.operators.IterPlan.withLoopPlanning(spark)(run()))
          case "shj" => withConf(
            "spark.graft.iterative.shjHints" -> "true")(run())
          case other => sys.error(s"unknown variant $other")
        }
      }
      val med = samples.map(_._1).sorted.apply(1)
      println(f"[lab] $v%-18s t=${samples.map(s => f"${s._1}%.2f").mkString(" ")} med=$med%.2f  ${samples.head._2}")
    }
    spark.stop()
  }
}
