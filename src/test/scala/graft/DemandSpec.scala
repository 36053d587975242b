package graft

import graft.pipelines.Demand
import org.apache.spark.sql.functions._

/** Hand-computed goldens for the demand assembly (formulas in the
  * Demand scaladoc). */
class DemandSpec extends SparkSpec {
  import spark.implicits._

  lazy val out = Demand.assemble(spark).cache()

  test("anchor month is exact: regional weighted income at 2010-07") {
    val r = out.where(col("month") === lit("2010-07-01").cast("timestamp"))
      .select("POP", "MEDHHINC_2010USD", "FUEL_2010USD")
      .as[(Double, Double, Double)].collect()(0)
    assert(r._1 == 6000.0)
    // (1000*50000 + 2000*51000 + 3000*52000)/6000, CPI factor 1
    assert(math.abs(r._2 - 51333.3333) < 1e-4)
    assert(r._3 == 3.0)
  }

  test("interpolated month: population moves 1/12 of the annual delta") {
    val r = out.where(col("month") === lit("2010-08-01").cast("timestamp"))
      .select("POP").as[Double].collect()(0)
    // counties gain 60*(c+1) per year -> +360/12 = +30 per month
    assert(math.abs(r - 6030.0) < 1e-9)
  }

  test("fuel gap is forward-filled then deflated") {
    val r = out.where(col("month") === lit("2010-09-01").cast("timestamp"))
      .select("FUEL_2010USD").as[Double].collect()(0)
    // k=2 is null -> carries k=1 value 3.01; CPI = 100.5
    assert(math.abs(r - 3.01 * 100.0 / 100.5) < 1e-6)
  }
}
