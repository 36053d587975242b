package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / sequential operators (SURVEY.md §2.6). The reference implements
  * all of these as sorted iterrows loops — the slowest pandas pattern; here
  * each is a single Catalyst window spec, partitioned by the natural entity
  * key so it parallelizes across executors with no driver involvement.
  */
object Windows {

  /** W1 — headway: minutes since the previous event within a partition,
    * ordered by time (GTFSHelper.py:87-104). First row per partition: null.
    * `tieBreak` makes ordering total so the result is deterministic under
    * shuffles.
    */
  def headwayMinutes(
      df: DataFrame, partition: Seq[String], ts: String, tieBreak: Seq[String],
      out: String = "headway_min"): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*)
      .orderBy((ts +: tieBreak).map(col): _*)
    // cast-to-double keeps fractional seconds; unix_timestamp floors to
    // whole seconds and shifts gaps that sit within 1s of a threshold
    df.withColumn(out,
      (col(ts).cast("timestamp").cast("double") - lag(col(ts), 1).over(w).cast("timestamp").cast("double")) / 60.0)
  }

  /** W2 — observed runtime: max(0, arrival - previous departure) in minutes
    * along a sequence (SFMuniDataExpander.py:35-53). First row: 0. */
  def runtimeMinutes(
      df: DataFrame, partition: Seq[String], seq: Seq[String],
      arrival: String, departure: String, out: String = "runtime_min"): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(seq.map(col): _*)
    val prevDep = lag(col(departure), 1).over(w)
    df.withColumn(out,
      when(prevDep.isNull, 0.0)
        .otherwise(greatest(lit(0.0),
          (col(arrival).cast("timestamp").cast("double") - prevDep.cast("timestamp").cast("double")) / 60.0)))
  }

  /** W4 — sessionization: a new session starts when the gap since the
    * previous event within the partition is >= `gapMinutes` (the Clipper
    * 90-minute transfer rule, ClipperHelper.py:209-246). Emits a 1-based
    * `sessionCol` id per partition plus an `isNewCol` flag.
    *
    * Classic two-window pattern: lag to detect the boundary, running sum of
    * boundaries to number the session. One shuffle on the partition keys.
    */
  def sessionize(
      df: DataFrame, partition: Seq[String], ts: String, tieBreak: Seq[String],
      gapMinutes: Double, sessionCol: String = "session_id",
      isNewCol: String = "session_start",
      breakWhen: Option[Column] = None): DataFrame = {
    val ord = (ts +: tieBreak).map(col)
    val w = Window.partitionBy(partition.map(col): _*).orderBy(ord: _*)
    // fractional-seconds gap (see headwayMinutes note)
    val gap = (col(ts).cast("timestamp").cast("double") - lag(col(ts), 1).over(w).cast("timestamp").cast("double")) / 60.0
    val break_ = gap.isNull || gap >= gapMinutes ||
      breakWhen.getOrElse(lit(false))
    val isNew = when(break_, 1).otherwise(0)
    df.withColumn(isNewCol, isNew)
      .withColumn(sessionCol,
        sum(col(isNewCol)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** W6 — running sum along a sequence (cumulative load,
    * TransitReporter.py:994-1008). */
  def runningSum(
      df: DataFrame, partition: Seq[String], order: Seq[String],
      expr: Column, out: String): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, sum(expr).over(w))
  }

  /** W8 — expansion weighting: scale `weight` so that the weighted total of
    * `target` matches its raw group total
    * (SFMuniDataExpander.py:122-166,600-619):
    * `w' = w * sum(target) over G / sum(w * target) over G`.
    * A single partition-only window — one shuffle, no joins.
    *
    * A group whose weighted target sums to zero (all-zero targets or
    * weights) has no scale factor; such rows keep their raw weight rather
    * than going null/Infinity and poisoning downstream rollups.
    */
  def scaleWeightsToTotals(
      df: DataFrame, group: Seq[String], weight: String, target: String,
      out: String = "weight_scaled"): DataFrame = {
    val g = Window.partitionBy(group.map(col): _*)
    val denom = sum(col(weight) * col(target)).over(g)
    val factor = when(denom =!= 0, sum(col(target)).over(g) / denom).otherwise(1.0)
    df.withColumn(out, col(weight) * factor)
  }

  /** W9 — chained carry-forward imputation: where the row is unobserved,
    * take the most recent observed value within the key, however far back
    * (the fixed point of the reference's month-by-month chained imputation,
    * SFMuniDataAggregator.py:371-464 — imputed values feed later months, so
    * carry-forward over an unbounded-preceding window reproduces the chain).
    * Adds `<c>_imp` columns and an `imputedCol` flag.
    */
  def imputeCarryForward(
      df: DataFrame, partition: Seq[String], order: Seq[String],
      observed: Column, valueCols: Seq[String],
      imputedCol: String = "imputed"): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val masked = valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(s"__obs_$c", when(observed, col(c)))
    }
    val filled = valueCols.foldLeft(masked) { (d, c) =>
      d.withColumn(s"${c}_imp", last(col(s"__obs_$c"), ignoreNulls = true).over(w))
    }
    // flag = unobserved AND at least one column actually carried a value
    // (head-only would misreport rows whose first column had no prior
    // observation while others did)
    val anyFilled = valueCols.map(c => col(s"${c}_imp").isNotNull).reduce(_ || _)
    filled
      .withColumn(imputedCol, (!observed && anyFilled).cast("int"))
      .drop(valueCols.map(c => s"__obs_$c"): _*)
  }

  /** A3/W9 at the reference's EXACT month grain
    * (SFMuniDataAggregator.py:371-464): the reference walks the store's
    * months in sorted order, left-joining each month against the PREVIOUS
    * AVAILABLE month's already-imputed table. Consequences, mirrored
    * exactly here:
    *  - values chain forward through unobserved months, across calendar
    *    gaps (the `prev_month in months` guard only skips the first
    *    month — every later prev_month is by construction in the list);
    *  - a KEY absent from an intermediate month's table breaks that key's
    *    chain (the left join finds nothing): value AND bookkeeping go
    *    null, and the null IMP propagates down-chain like pandas NaN;
    *  - `IMP_TRIP_STOPS` = OBS_prev + IMP_prev telescopes to the OBS
    *    count of the chain's anchor month; 0 for observed rows and for
    *    unobserved rows of the very first month (initialized, never
    *    overwritten).
    *
    * Window form: rank months globally (tiny broadcast dimension), then
    * per key a chain-run is a stretch of rows with consecutive GLOBAL
    * ranks (`rank - row_number` constant); within a run, carry the last
    * observed value and pin the anchor's OBS. MonthImputeSpec proves
    * equality with the literal sequential algorithm on a multi-gap,
    * key-dropout fixture.
    */
  def imputeMonthChain(
      df: DataFrame, keys: Seq[String], monthIdxCol: String,
      valueCols: Seq[String], obsCol: String,
      impOut: String = "IMP_TRIP_STOPS"): DataFrame = {
    // global month rank: bounded dimension (one row per month in store),
    // built with a single-partition window over the DISTINCT months only —
    // constant-partitioned and runtime-bounded (Guards contract)
    val months = df.select(col(monthIdxCol)).distinct()
      .withColumn("__mrank", Guards.bounded(
        row_number().over(Window.partitionBy(Guards.constKey(col(monthIdxCol)))
          .orderBy(col(monthIdxCol))),
        col(monthIdxCol), "imputeMonthChain distinct months"))
    val part = Window.partitionBy(keys.map(col): _*).orderBy(col(monthIdxCol))
    val d = df.join(broadcast(months), monthIdxCol)
      .withColumn("__run", col("__mrank") - row_number().over(part))
    val runW = Window.partitionBy((keys :+ "__run").map(col): _*)
      .orderBy(col(monthIdxCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obs = col(obsCol)
    // observed rows keep their values VERBATIM (even legitimate nulls);
    // obs==0 rows take the LATEST OBSERVED month's value — including an
    // observed null (the sequential chain copies month-to-month, so an
    // observed-null month propagates null, it is not skipped). The struct
    // wrapper makes the carrier non-null for every observed row, so
    // last(ignoreNulls) anchors on recency-of-observation, not
    // non-nullness-of-value.
    val filled = valueCols.foldLeft(d) { (acc, c) =>
      acc.withColumn(c,
        when(obs > 0, col(c)).otherwise(
          last(when(obs > 0, struct(col(c).as("v"))), ignoreNulls = true)
            .over(runW).getField("v")))
    }
    val anchorObs = last(when(obs > 0, obs), ignoreNulls = true).over(runW)
    val runStartsAtFirstMonth =
      min(col("__mrank")).over(Window.partitionBy((keys :+ "__run").map(col): _*)) === 1
    filled
      .withColumn(impOut,
        when(obs > 0, lit(0L))
          .when(anchorObs.isNotNull, anchorObs)
          // an unobserved, unanchored chain that began at the store's first
          // month keeps the initialized 0 (0 + 0 telescopes); one that began
          // later hit a missing prev row -> pandas NaN -> null
          .when(runStartsAtFirstMonth, lit(0L)))
      .drop("__run", "__mrank")
  }

  /** Rolling z-score anomaly flag over an integral series — the
    * "is today off-trend" monitor. The rolling mean/stddev come from
    * EXACT integer sums over the frame (n, Σy, Σy²): variance =
    * (nΣy² − (Σy)²) / (n(n−1)) with every operand exact until the
    * final IEEE divisions/sqrt, so z-scores are engine-portable
    * bit-for-bit — no Welford-style accumulator whose merge order
    * could differ between engines. Keyed window (parallel by the
    * group key); `valueCol` must be integral-valued.
    *
    * Adds (n, z, is_anomaly): z null while the frame has < 2 rows or
    * zero variance; is_anomaly never null (false when z is). */
  def rollingZscore(df: DataFrame, keys: Seq[String], orderCol: Column,
                    valueCol: Column, window: Int,
                    cutoff: Double = 2.0): DataFrame = {
    require(window >= 2, "rolling window needs at least 2 rows")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
      .rowsBetween(-(window - 1), 0)
    val y = valueCol.cast("long")
    val d = df
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(y).over(w))
      .withColumn("__sxx", sum(y * y).over(w))
    val varNum = d("__n") * d("__sxx") - d("__sx") * d("__sx")
    val z = when(d("__n") >= 2 && varNum > 0,
      (y.cast("double") - d("__sx").cast("double") / d("__n").cast("double")) /
        sqrt(varNum.cast("double") /
          (d("__n") * (d("__n") - 1)).cast("double")))
    d.withColumn("n", col("__n"))
      .withColumn("z", z)
      .withColumn("is_anomaly", coalesce(abs(z) > lit(cutoff), lit(false)))
      .drop("__n", "__sx", "__sxx")
  }

  /** Time-weighted average per entity — the sensor/IoT mean where a
    * reading HOLDS until the next one arrives, so each value weighs by
    * its holding duration, not its sample count (burst-sampled idle
    * periods stop dominating the plain mean). One keyed lead window
    * (total order: ts then a unique tie-break), then exact arithmetic
    * end-to-end: 9-dp-rounded decimal values × integer microsecond
    * durations sum exactly, and only the final divide is a double —
    * bit-identical in any engine at any partition order. The last
    * reading per entity has no holding interval and is excluded
    * (entities with one reading vanish; emit them separately if "no
    * interval" is itself a signal).
    *
    * Returns (keys..., n_intervals, span_seconds, twa).
    */
  def timeWeightedAverage(df: DataFrame, keys: Seq[String], tsCol: Column,
                          tieBreak: Column, valueCol: Column): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tsCol, tieBreak)
    val us = unix_micros(tsCol.cast("timestamp"))
    val dur = lead(us, 1).over(w) - us
    df.withColumn("__dur", dur)
      .where(col("__dur").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        round(sum(col("__dur")).cast("double") / 1e6, 6).as("span_seconds"),
        round(
          sum(round(valueCol, 9).cast("decimal(28,9)") * col("__dur"))
            .cast("double") / sum(col("__dur")).cast("double"), 6).as("twa"))
  }
}
