package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W5 — the reference's full taxi GPS trip segmentation
  * (TaxiDataHelper.py:195-320): per vehicle, ordered by time,
  *
  *   1. consecutive-point measures: feet, seconds, speed (mph)
  *   2. forward_stationary_time — running sum of seconds while speed stays
  *      below the threshold, reset to 0 on any fast point
  *      (TaxiDataHelper.py:231-238)
  *   3. backward_stationary_time — the same accumulation run backwards in
  *      time against the NEXT point's speed/seconds
  *      (TaxiDataHelper.py:245-268)
  *   4. trip breaks on any of the 5 predicates (status change, long gap,
  *      long jump, long stop, last-point-before-a-stop); trip_id = running
  *      break count (TaxiDataHelper.py:283-306)
  *   5. per-trip num_points / trip_length, filtered to real trips
  *      (TaxiDataHelper.py:315-317)
  *
  * The reference's three iterrows passes with a conditional-reset
  * accumulator become the classic two-window trick, applied once forward
  * and once backward: a running count of reset rows defines a group key,
  * and the running sum of contributions within (vehicle, group) IS the
  * conditional-reset running sum. Six window specs over two orderings —
  * no UDFs, no driver loops; each vehicle's chain is one partition, so a
  * 1000-executor cluster processes vehicles independently.
  */
object Taxi {

  /** Reference thresholds (TaxiDataHelper.py:68-84). */
  val SpeedThresholdMph  = 1.0
  val StationarySeconds  = 180.0
  val MaxSecondsBetween  = 300.0
  val MaxFeetBetween     = 7500.0
  val MinTripFeet        = 500.0

  /** Per-point segmentation: adds seconds/feet/speed, both stationary
    * times, `is_break`, and `trip_id` (1-based per vehicle).
    *
    * `tsCol` must be a timestamp; `tieCol` makes the order total (the
    * reference sorts by time alone — any GPS ping sharing a timestamp
    * would get a nondeterministic pandas order; we refuse the ambiguity).
    * Speed on a zero-second gap is +inf in the reference (division by
    * zero); here the row is treated as fast (reset, no stationary
    * accumulation) without ANSI-mode division errors.
    */
  def segmentPoints(
      points: DataFrame, vehicleCols: Seq[String], tsCol: String,
      tieCol: String, xCol: String, yCol: String, statusCol: String,
      speedThresholdMph: Double = SpeedThresholdMph,
      stationarySeconds: Double = StationarySeconds,
      maxSecondsBetween: Double = MaxSecondsBetween,
      maxFeetBetween: Double = MaxFeetBetween): DataFrame = {

    val part = vehicleCols.map(col)
    val w = Window.partitionBy(part: _*).orderBy(col(tsCol), col(tieCol))
    def run(c: Column) =
      c.over(Window.partitionBy(part: _*).orderBy(col(tsCol), col(tieCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val wDesc = Window.partitionBy(part: _*)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    def runDesc(c: Column, extra: Column*) =
      c.over(Window.partitionBy(part ++ extra: _*)
        .orderBy(col(tsCol).desc, col(tieCol).desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    val measured = points
      .withColumn("seconds",
        // via-timestamp cast keeps this total over TIMESTAMP_NTZ inputs
        // (identity when already TIMESTAMP, wall-clock no-op under UTC)
        col(tsCol).cast("timestamp").cast("double") -
          lag(col(tsCol), 1).over(w).cast("timestamp").cast("double"))
      .withColumn("feet",
        sqrt(pow(col(xCol) - lag(col(xCol), 1).over(w), 2) +
             pow(col(yCol) - lag(col(yCol), 1).over(w), 2)))
      .withColumn("status_chg",
        (lag(col(statusCol), 1).over(w).isNotNull &&
          col(statusCol) =!= lag(col(statusCol), 1).over(w)).cast("int"))
      // null for the first point; a zero-second gap would be +inf in the
      // reference — leave it null here and treat null-speed as fast below
      .withColumn("speed",
        when(col("seconds") > 0, col("feet") / col("seconds") * 0.681818))

    // forward stationary time: reset on first point or any fast point;
    // group = running reset count; value = running sum of slow seconds
    // within the group
    val fwdReset = (col("seconds").isNull || col("seconds") === 0 ||
      col("speed") >= speedThresholdMph).cast("int")
    val fwd = measured
      .withColumn("__fr", fwdReset)
      .withColumn("__fg", run(sum(col("__fr"))))
    val fst = fwd.withColumn("fwd_stationary",
      coalesce(
        sum(when(col("__fr") === 0, col("seconds")))
          .over(Window.partitionBy(part :+ col("__fg"): _*)
            .orderBy(col(tsCol), col(tieCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        lit(0.0)))

    // backward stationary time: same trick over descending order, driven
    // by the NEXT point's seconds/speed (TaxiDataHelper.py:258-263)
    val bwd = fst
      .withColumn("__s2", lead(col("seconds"), 1).over(w))
      .withColumn("__sp2", lead(col("speed"), 1).over(w))
      .withColumn("__br",
        (col("__s2").isNull || col("__s2") === 0 ||
          col("__sp2") >= speedThresholdMph).cast("int"))
      .withColumn("__bg", sum(col("__br")).over(
        wDesc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bst = bwd.withColumn("bwd_stationary",
      coalesce(runDesc(sum(when(col("__br") === 0, col("__s2"))), col("__bg")),
        lit(0.0)))

    // the 5 break predicates; if/elif in the reference, but each branch
    // only ever increments once, so the running OR-count is identical
    val isBreak = (col("seconds").isNull ||
      col("status_chg") === 1 ||
      col("seconds") > maxSecondsBetween ||
      col("feet") > maxFeetBetween ||
      col("fwd_stationary") > stationarySeconds ||
      (col("bwd_stationary") > stationarySeconds && col("fwd_stationary") > 0)
      ).cast("int")
    bst.withColumn("is_break", isBreak)
      .withColumn("trip_id", run(sum(col("is_break"))))
      .drop("__fr", "__fg", "__s2", "__sp2", "__br", "__bg")
  }

  /** Trips from segmented points: num_points, trip_length (sum of feet,
    * the first point's inherited inter-trip feet included — the
    * reference's groupby sums the raw column the same way), span; filtered
    * to `num_points > 1 and trip_length > minTripFeet`
    * (TaxiDataHelper.py:34-40,315-317). */
  def toTrips(
      segmented: DataFrame, vehicleCols: Seq[String], tsCol: String,
      minTripFeet: Double = MinTripFeet): DataFrame =
    segmented
      .groupBy((vehicleCols :+ "trip_id").map(col): _*)
      .agg(count(lit(1)).as("num_points"),
        sum(coalesce(col("feet"), lit(0.0))).as("trip_length"),
        min(col(tsCol)).as("start_ts"), max(col(tsCol)).as("end_ts"))
      .where(col("num_points") > 1 && col("trip_length") > minTripFeet)
}
