package graft.pipelines

import graft.operators.TimeSeries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demand-driver assembly (DemandHelper.py §7.2 item 7): county-level
  * annual socioeconomic anchors interpolated to months (T1, July-anchored),
  * a step-function price series forward-filled over the spine (T3), CPI
  * deflation to base dollars (E11), and the A12 regional rollup where the
  * median income aggregates as sum(POP·INC)/sum(POP).
  *
  * The fixture is formula-generated so the DuckDB oracle (q57) can rebuild
  * it independently: for county c in 0..2, year y in 2010..2014,
  *   POP(c,y)  = 1000·(c+1) + 60·(y−2010)·(c+1)
  *   INC(c,y)  = 50000 + 1000·c + 500·(y−2010)
  * anchored at July 1; monthly CPI(k) = 100 + 0.25·k and
  * FUEL(k) = 3.0 + 0.01·k with FUEL null when k%5 == 2 (k = months since
  * 2010-07).
  */
object Demand {

  def countyAnchors(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = for (c <- 0 to 2; y <- 2010 to 2014) yield
      (s"F$c", y, 1000.0 * (c + 1) + 60.0 * (y - 2010) * (c + 1),
        50000.0 + 1000.0 * c + 500.0 * (y - 2010))
    rows.toDF("FIPS", "year", "POP", "MEDHHINC")
      .withColumn("month", to_timestamp(concat(col("year"), lit("-07-01"))))
      .drop("year")
  }

  def monthlySeries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 to 48).map { k =>
      (k, f"${2010 + (6 + k) / 12}%04d-${(6 + k) % 12 + 1}%02d-01",
        100.0 + 0.25 * k,
        if (k % 5 == 2) None else Some(3.0 + 0.01 * k))
    }.toDF("k", "m", "CPI", "FUEL")
      .withColumn("month", to_timestamp(col("m"))).drop("m")
  }

  /** county anchors -> monthly interpolation -> regional weighted rollup ->
    * CPI-deflated assembly. */
  def assemble(spark: SparkSession): DataFrame = {
    val anchors = countyAnchors(spark)
    val monthly = monthlySeries(spark)
    // spine per county over the FULL monthly range, left-join anchors
    val spine = monthly.select(col("month")).crossJoin(
      anchors.select("FIPS").distinct())
    val joined = spine.join(anchors, Seq("FIPS", "month"), "left")
      .withColumn("idx", year(col("month")) * 12 + month(col("month")))
    val interp1 = TimeSeries.interpolateLinear(joined, Seq("FIPS"), "idx", "POP", "POP_M")
    val interp = TimeSeries.interpolateLinear(interp1, Seq("FIPS"), "idx", "MEDHHINC", "INC_M")
    // A12: regional totals; median income weighted by population
    val regional = interp.groupBy("month")
      .agg(sum("POP_M").as("POP"),
        (sum(col("POP_M") * col("INC_M")) / sum(col("POP_M"))).as("MEDHHINC"))
    // T3 ffill fuel + E11 deflation, assembled on MONTH
    val fuel = TimeSeries.ffill(monthly, Seq.empty, "month", Seq("FUEL"))
    regional.join(fuel, Seq("month"), "left")
      .withColumn("CPI_FACTOR", lit(100.0) / col("CPI"))
      .select(col("month"), round(col("POP"), 4).as("POP"),
        round(col("MEDHHINC") * col("CPI_FACTOR"), 4).as("MEDHHINC_2010USD"),
        round(col("FUEL") * col("CPI_FACTOR"), 6).as("FUEL_2010USD"))
  }
}
