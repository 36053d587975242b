package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling / interpolation (SURVEY.md §2.9). The reference
  * leans on pandas `resample`/`interpolate`; here the spine is generated
  * with `explode(sequence(...))` and interpolation is two window passes —
  * all relational, all distributed.
  */
object TimeSeries {

  /** Month spine: one row per (key, month) for every month between the
    * global min and max of `monthCol`. Keys come from `keyDf` (distinct
    * key rows); the spine is a tiny exploded range cross-joined with keys,
    * so at scale the subsequent join against facts is the only shuffle.
    */
  def monthSpine(df: DataFrame, keys: Seq[String], monthCol: String): DataFrame = {
    val bounds = df.select(
      min(date_trunc("MONTH", col(monthCol))).as("lo"),
      max(date_trunc("MONTH", col(monthCol))).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 MONTH"))).as(monthCol))
    if (keys.isEmpty) spine
    else df.select(keys.map(col): _*).distinct().crossJoin(spine)
  }

  /** T4 — resample-asfreq: surface missing months as null rows
    * (TransitReporter.py:81-85). One row per key×month, values null where
    * no data existed. */
  def resampleMonthly(df: DataFrame, keys: Seq[String], monthCol: String): DataFrame =
    monthSpine(df, keys, monthCol).join(df, keys :+ monthCol, "left")

  /** T1/T2/T5 — linear interpolation by position along `orderCol` (an
    * integer position, e.g. months since epoch), per key
    * (DemandHelper.py:1559-1619). Interior nulls are linearly interpolated;
    * leading/trailing nulls are filled with the nearest anchor (flat
    * extrapolation; callers wanting the reference's linear end-extrapolation
    * prepend synthetic anchor rows).
    */
  def interpolateLinear(
      df: DataFrame, keys: Seq[String], orderCol: String, value: String,
      out: String): DataFrame = {
    val part = Window.partitionBy(Guards.partitionCols(keys, col(orderCol)): _*).orderBy(col(orderCol))
    val past = part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = part.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(value)
    val t = col(orderCol).cast("double")
    val prevV = last(v, ignoreNulls = true).over(past)
    val prevT = last(when(v.isNotNull, t), ignoreNulls = true).over(past)
    val nextV = first(v, ignoreNulls = true).over(future)
    val nextT = first(when(v.isNotNull, t), ignoreNulls = true).over(future)
    val interp = prevV + (nextV - prevV) * (t - prevT) / (nextT - prevT)
    df.withColumn(out,
      Guards.guardIfGlobal(keys,
        coalesce(v,
          when(prevV.isNotNull && nextV.isNotNull, interp),
          prevV, nextV),
        col(orderCol), s"interpolateLinear($value)"))
  }

  /** T1 in the reference's FULL form (DemandHelper.py:1558-1619): annual
    * values anchored at July 1 (April 1 for census years), ONE-YEAR LINEAR
    * EXTRAPOLATION at both ends via synthetic anchor years
    * (v0' = 2*v_first - v_second at year_min-1; symmetric at year_max+1),
    * monthly spine, per-month-position linear interpolation, then trimmed
    * to Jan(year_min)..Dec(year_max). A key with a single annual value
    * gets null synthetic anchors and falls back to flat fill — the same
    * NaN arithmetic outcome as the reference.
    */
  def annualToMonthly(
      df: DataFrame, keys: Seq[String], yearCol: String,
      valueCols: Seq[String], censusYears: Seq[Int] = Nil): DataFrame = {
    val base = df.select(
      (keys.map(col) :+ col(yearCol).cast("int").as("__yr")) ++
        valueCols.map(col): _*)
    val pa = Window.partitionBy(Guards.partitionCols(keys, col("__yr")): _*).orderBy(col("__yr"))
    val pd = Window.partitionBy(Guards.partitionCols(keys, col("__yr")): _*).orderBy(col("__yr").desc)
    val withNb = valueCols.foldLeft(base) { (d, c) =>
      d.withColumn(s"__nx_$c", lead(col(c), 1).over(pa))
        .withColumn(s"__pv_$c", lag(col(c), 1).over(pa))
    }.withColumn("__rnA",
        Guards.guardIfGlobal(keys, row_number().over(pa), col("__yr"), "annualToMonthly anchors"))
      .withColumn("__rnD", row_number().over(pd))
    val synthStart = withNb.where(col("__rnA") === 1).select(
      (keys.map(col) :+ (col("__yr") - 1).as("__yr")) ++
        valueCols.map(c => (col(c) * 2 - col(s"__nx_$c")).as(c)): _*)
    val synthEnd = withNb.where(col("__rnD") === 1).select(
      (keys.map(col) :+ (col("__yr") + 1).as("__yr")) ++
        valueCols.map(c => (col(c) * 2 - col(s"__pv_$c")).as(c)): _*)
    val anchors = base.unionByName(synthStart).unionByName(synthEnd)
      .withColumn("__month", make_date(col("__yr"),
        if (censusYears.isEmpty) lit(7)
        else when(col("__yr").isin(censusYears.map(Integer.valueOf): _*), 4)
          .otherwise(7),
        lit(1)))
    // monthly spine across the anchor range (synthetic ends included)
    val bounds = anchors.select(min("__month").as("lo"), max("__month").as("hi"))
    val spine0 = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 MONTH"))).as("month"))
    val spine =
      if (keys.isEmpty) spine0
      else df.select(keys.map(col): _*).distinct().crossJoin(spine0)
    val joined = spine.join(
        anchors.select((keys.map(col) :+ col("__month").as("month")) ++
          valueCols.map(col): _*),
        keys :+ "month", "left")
      .withColumn("__idx", year(col("month")) * 12 + month(col("month")))
    val interped = valueCols.foldLeft(joined) { (d, c) =>
      interpolateLinear(d, keys, "__idx", c, c + "__i")
        .drop(c).withColumnRenamed(c + "__i", c)
    }
    // trim to the REAL year range per key (drops the synthetic half-years)
    val range = base.groupBy(keys.map(col): _*)
      .agg(min("__yr").as("__y0"), max("__yr").as("__yN"))
    val bounded =
      if (keys.isEmpty) interped.crossJoin(broadcast(range))
      else interped.join(broadcast(range), keys)
    bounded
      .where(col("month").between(make_date(col("__y0"), lit(1), lit(1)),
        make_date(col("__yN"), lit(12), lit(1))))
      .select((keys.map(col) :+ col("month")) ++ valueCols.map(col): _*)
  }

  /** T3 — step-function forward fill (tolls/parking/fares resample-ffill,
    * DemandHelper.py:1444-1513). */
  def ffill(df: DataFrame, keys: Seq[String], orderCol: String,
            valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(Guards.partitionCols(keys, col(orderCol)): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, Guards.guardIfGlobal(keys,
        last(col(c), ignoreNulls = true).over(w), col(orderCol), s"ffill($c)"))
    }
  }

  /** T6-style anchored cumulative reconstruction: given per-period `net`
    * changes and one anchored absolute `anchorValue` at `anchorAt`, rebuild
    * the absolute series forward and backward from the anchor:
    * stock(t) = anchor + cumsum(net) - cumsum_at_anchor
    * (DemandHelper.py:923-933 does this with two iterative loops).
    */
  def reconstructFromAnchor(
      df: DataFrame, keys: Seq[String], orderCol: String, net: String,
      anchorAt: Column, anchorValue: Column, out: String): DataFrame = {
    val part = Window.partitionBy(Guards.partitionCols(keys, col(orderCol)): _*).orderBy(col(orderCol))
    val cum = sum(coalesce(col(net), lit(0.0)))
      .over(part.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val all = Window.partitionBy(Guards.partitionCols(keys, col(orderCol)): _*)
    val d = df.withColumn("__cum",
      Guards.guardIfGlobal(keys, cum, col(orderCol), "reconstructFromAnchor cumsum"))
    d.withColumn("__anchor_cum", max(when(anchorAt, col("__cum"))).over(all))
      .withColumn(out, anchorValue + col("__cum") - col("__anchor_cum"))
      .drop("__cum", "__anchor_cum")
  }

  /** Closed-form per-group OLS trend (slope/intercept/r2 of y on x) —
    * the "is this series drifting" primitive, as ONE aggregation: the
    * normal equations need only the five sufficient statistics
    * (n, Σx, Σy, Σxy, Σx², [Σy²]), which partial-aggregate map-side and
    * merge associatively — no per-group sort, no second pass, no
    * driver-side fitting. With integer-valued x and y the sums are
    * EXACT (64-bit) on both engines; the final divisions are the only
    * float ops, IEEE-identical on identical operands, so slope and
    * intercept are engine-portable without tolerance. Large products
    * ((nΣxy−ΣxΣy)², for r2) go through double BEFORE squaring — the
    * square of an exact long would overflow 64 bits.
    *
    * x and y must be integral-valued columns (cast upstream); groups
    * with < 2 points or zero x-variance return null slope/r2. */
  def olsTrend(df: DataFrame, keys: Seq[String], xCol: Column,
               yCol: Column): DataFrame = {
    val x = xCol.cast("long"); val y = yCol.cast("long")
    val agg = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val sxxN = agg("n") * agg("sxy") - agg("sx") * agg("sy")
    val sxxD = agg("n") * agg("sxx") - agg("sx") * agg("sx")
    val syyD = agg("n") * agg("syy") - agg("sy") * agg("sy")
    val slope = when(sxxD =!= 0, sxxN.cast("double") / sxxD.cast("double"))
    val intercept = (agg("sy").cast("double") -
      slope * agg("sx").cast("double")) / agg("n").cast("double")
    val r2 = when(sxxD =!= 0 && syyD =!= 0,
      (sxxN.cast("double") * sxxN.cast("double")) /
        (sxxD.cast("double") * syyD.cast("double")))
    agg.select(keys.map(col) ++ Seq(col("n"), slope.as("slope"),
      intercept.as("intercept"), r2.as("r2")): _*)
  }

  /** Exponentially weighted moving average per key — simple exponential
    * smoothing, y₁ = x₁; yₜ = α·xₜ + (1−α)·yₜ₋₁. The recursion has no
    * windowed closed form Spark exposes, so each key's BOUNDED series
    * (months/weeks per entity — the [[ffill]]/[[interpolateLinear]]
    * grain) collapses to one sorted struct array and the recurrence runs
    * as a sequential `aggregate` fold emitting every prefix, exploded
    * back to rows with the order key for the join-free reassembly.
    * Per-key state is the series itself — fine at any corpus width
    * because series LENGTH is calendar-bounded; this is the same
    * trade [[reconstructFromAnchor]] makes.
    *
    * Determinism: the fold is sequential by construction (same
    * left-to-right order in any engine — DuckDB replays it with a
    * recursive CTE), and α/(1−α) are passed as two literals so both
    * engines multiply the same constants.
    *
    * Returns (keys..., orderCol, value, ewma).
    */
  def ewma(df: DataFrame, keys: Seq[String], orderCol: String,
           valueCol: Column, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val arr = df
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(
        struct(col(orderCol).as("o"), valueCol.cast("double").as("x"))))
        .as("__s"))
    val folded = arr.withColumn("__y",
      aggregate(
        slice(col("__s"), lit(2), greatest(size(col("__s")) - 1, lit(0))),
        array(element_at(col("__s"), 1).getField("x")),
        (acc, e) => concat(acc,
          array(lit(alpha) * e.getField("x") +
            lit(1.0 - alpha) * element_at(acc, size(acc))))))
    folded
      .select((keys.map(col) :+
        posexplode(arrays_zip(col("__s"), col("__y"))).as(Seq("__i", "__z"))): _*)
      .select((keys.map(col) ++ Seq(
        col("__z.__s.o").as(orderCol),
        col("__z.__s.x").as("value"),
        round(col("__z.__y").cast("double"), 6).as("ewma"))): _*)
  }

  /** Classical additive seasonal decomposition (the "decompose" member
    * of the STL family — Cleveland et al. 1990's framing, via the
    * moving-average construction in Hyndman & Athanasopoulos FPP3
    * §3.4): y = trend + seasonal + remainder per series.
    *
    *  - trend: centered `period`-point moving average (odd period), null
    *    on the h = period/2 edge rows where the window is short;
    *  - seasonal: per-(series, phase) mean of the detrended interior,
    *    centered so the seasonal component sums to ~0 over one period
    *    (phase = days since 1970-01-01 mod period — an engine-neutral
    *    integer, where dayofweek() is famously not: Spark counts Sunday
    *    as 1, DuckDB as 0);
    *  - remainder: y − trend − seasonal on interior rows.
    *
    * `yCol` is cast to LONG (counts/integral measures): integer window
    * sums are order-independent, so the sliding trend is exact on both
    * engines regardless of how each engine's window internals associate
    * the additions — a double input would hash-diverge under DuckDB's
    * segment-tree window sums. Means run the decimal-exact
    * round-then-sum regime at 6 dp.
    *
    * Scale shape: windows partition by the series key (naturally
    * parallel), the seasonal/centering dims are (keys × period)-scale
    * joins. Returns (key, day, y, trend, seasonal, remainder). */
  def stlDecompose(df: DataFrame, keyCol: String, dayCol: String,
                   yCol: String, period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      "stlDecompose needs an odd period >= 3 for a centered window")
    val h = period / 2
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(-h, h)
    val phase = pmod(datediff(col(dayCol), to_date(lit("1970-01-01"))),
      lit(period))
    // NOT round(): these means are rationals with SMALL denominators
    // (window size, phase count), which land exactly on 6-dp half
    // points where built-in round() disagrees between engines — see
    // [[graft.functions.Exprs.pround]] (this operator is where the
    // divergence was first observed)
    val r6 = (c: Column) => graft.functions.Exprs.pround(c, 6)
    val t = df.select(col(keyCol), col(dayCol),
        col(yCol).cast("long").as("y"))
      .withColumn("trend",
        when(count(lit(1)).over(w) === period,
          r6(sum(col("y")).over(w) / lit(period.toDouble))))
    // y − trend is a near-grid double (trend is on the 6-dp grid), so
    // the decimal cast below is unambiguous — no re-round needed
    val det = t.where(col("trend").isNotNull)
      .select(col(keyCol), phase.as("__ph"),
        (col("y") - col("trend")).as("__detr"))
    val sraw = det.groupBy(col(keyCol), col("__ph"))
      .agg(r6(sum(col("__detr").cast("decimal(28,6)")).cast("double") /
        count(lit(1))).as("__sraw"))
    val smean = sraw.groupBy(col(keyCol))
      .agg(r6(sum(col("__sraw").cast("decimal(28,6)")).cast("double") /
        count(lit(1))).as("__smean"))
    val seasonal = sraw.join(smean, Seq(keyCol))
      .select(col(keyCol), col("__ph"),
        r6(col("__sraw") - col("__smean")).as("seasonal"))
    t.withColumn("__ph", phase)
      .join(seasonal, Seq(keyCol, "__ph"), "left")
      .select(col(keyCol), col(dayCol), col("y"), col("trend"),
        col("seasonal"),
        when(col("trend").isNotNull,
          r6(col("y") - col("trend") - col("seasonal")))
          .as("remainder"))
  }
}
