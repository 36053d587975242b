package graft

import org.apache.spark.sql.functions._

/** q53's scale-path sketches: accuracy bounds vs the exact aggregates on
  * the real sf0.001 tables. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% and approx_percentile within 2% of exact") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val both = li.groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("exact_d"),
        approx_count_distinct(col("l_partkey")).as("approx_d"),
        expr("percentile(l_extendedprice, 0.95)").as("exact_p"),
        expr("approx_percentile(l_extendedprice, 0.95)").as("approx_p"))
      .as[(String, Long, Long, Double, Double)].collect()
    both.foreach { case (_, ed, ad, ep, ap) =>
      assert(math.abs(ad - ed).toDouble / ed < 0.05, s"distinct $ad vs $ed")
      assert(math.abs(ap - ep) / ep < 0.02, s"p95 $ap vs $ep")
    }
  }
}
