package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression library (SURVEY.md §2.8). Pure Column expressions —
  * zero UDFs — so everything stays inside whole-stage codegen.
  */
object Exprs {

  /** E1 — service-day wraparound: an HHMMSS int >= 240000 belongs to the
    * next calendar day but the same service day
    * (sfdata_wrangler/SFMuniDataHelper.py:622-649). `dateCol` is the
    * service date; returns a full timestamp.
    */
  def serviceTime(dateCol: Column, hhmmss: Column): Column = {
    val t = when(hhmmss >= 240000, hhmmss - 240000).otherwise(hhmmss)
    val ts = to_timestamp(
      concat(date_format(dateCol, "yyyy-MM-dd"), lit(" "), lpad(t.cast("string"), 6, "0")),
      "yyyy-MM-dd HHmmss")
    when(hhmmss >= 240000, ts + expr("INTERVAL 1 DAY")).otherwise(ts)
  }

  /** E1 (Clipper 3 am rule, ClipperHelper.py:31-42): timestamps before
    * 03:00 count toward the previous service day. */
  def serviceDate(ts: Column): Column =
    when(hour(ts) < 3, to_date(ts) - expr("INTERVAL 1 DAY")).otherwise(to_date(ts))

  /** E2 — int date `%m%d%y` -> date (SFMuniDataHelper.py:652-658). */
  def mdyIntToDate(i: Column): Column =
    to_date(lpad(i.cast("string"), 6, "0"), "MMddyy")

  /** E10 — fiscal year: Jul-Jun, labeled by ending year
    * (MultiModalHelper.py:31-38). */
  def fiscalYear(d: Column): Column =
    when(month(d) <= 6, year(d)).otherwise(year(d) + 1)

  /** E10 — month floor (DemandHelper.py:42-50). */
  def monthFloor(d: Column): Column = trunc(d, "MM")

  /** E11 — CPI deflation factor: base-year CPI / CPI
    * (DemandHelper.py:1528-1556). */
  def cpiFactor(cpi: Column, baseCpi: Column): Column = baseCpi / cpi

  /** E9 — time-of-day bucketing on an HHMM int (GTFSHelper.py:387-402's
    * TEP buckets, generalized). */
  def todBucket(hhmm: Column): Column =
    when(hhmm < 300, "EVENING")
      .when(hhmm < 600, "EARLY MORNING")
      .when(hhmm < 900, "AM PEAK")
      .when(hhmm < 1400, "MIDDAY")
      .when(hhmm < 1600, "SCHOOL")
      .when(hhmm < 1900, "PM PEAK")
      .otherwise("EVENING")

  /** E5 — speed in mph from miles and decimal minutes, rounded 2dp
    * (SFMuniDataExpander.py:66-79). Guards div-by-zero with null. */
  def speedMph(miles: Column, minutes: Column): Column =
    round(when(minutes > 0, miles / (minutes / 60.0)), 2)

  /** E5 — on-time flag: departed no more than 1 min early AND arrived
    * less than 5 min late (SFMuniDataExpander.py:550-551), null when
    * unobserved. */
  def onTime5(depDevMin: Column, arrDevMin: Column, observed: Column): Column =
    when(observed === 0, lit(null))
      .otherwise((depDevMin > -1 && arrDevMin < 5).cast("int"))

  /** E12 — Lambert conformal conic forward projection (two standard
    * parallels), closed form per Snyder, "Map Projections — A Working
    * Manual" (USGS PP 1395), eqs. 15-1..15-10. Replaces the reference's
    * pyproj NAD83 / CA zone 3 projection (GTFSHelper.py:38-61). Pure
    * Column math so it stays codegen'd; good enough for planar distance
    * at city scale.
    */
  /** Projection constants (cone constant n, R·F, rho0) for the spherical
    * LCC — exposed so callers (and SQL oracles) can inline the exact same
    * doubles. */
  def lccConstants(lat1Deg: Double, lat2Deg: Double, lat0Deg: Double)
      : (Double, Double, Double) = {
    val R = 20902231.0 // mean Earth radius ~6371 km in ft
    val d2r = math.Pi / 180.0
    val p1 = lat1Deg * d2r; val p2 = lat2Deg * d2r; val p0 = lat0Deg * d2r
    val n =
      if (math.abs(p1 - p2) < 1e-12) math.sin(p1)
      else math.log(math.cos(p1) / math.cos(p2)) /
        math.log(math.tan(math.Pi / 4 + p2 / 2) / math.tan(math.Pi / 4 + p1 / 2))
    val rf = R * math.cos(p1) * math.pow(math.tan(math.Pi / 4 + p1 / 2), n) / n
    val rho0 = rf / math.pow(math.tan(math.Pi / 4 + p0 / 2), n)
    (n, rf, rho0)
  }

  def lccXY(lonDeg: Column, latDeg: Column,
            lat1Deg: Double = 37.066667, lat2Deg: Double = 38.433333,
            lat0Deg: Double = 36.5, lon0Deg: Double = -120.5,
            falseEastingFt: Double = 6561666.667, falseNorthingFt: Double = 1640416.667)
      : (Column, Column) = {
    val d2r = math.Pi / 180.0
    val (n, rf, rho0) = lccConstants(lat1Deg, lat2Deg, lat0Deg)
    val lat = latDeg * lit(d2r)
    val lon = lonDeg * lit(d2r)
    val rho = lit(rf) / pow(tan(lit(math.Pi / 4) + lat / 2), lit(n))
    val theta = lit(n) * (lon - lit(lon0Deg * d2r))
    val x = rho * sin(theta) + lit(falseEastingFt)
    val y = lit(rho0) - rho * cos(theta) + lit(falseNorthingFt)
    (x, y)
  }

  /** Planar Euclidean distance. */
  def planarDist(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    sqrt(pow(x1 - x2, 2) + pow(y1 - y2, 2))

  /** PORTABLE half-up rounding: floor(x·10^s + 0.5) / 10^s, the
    * identical IEEE expression tree on every engine. Built-in round()
    * implementations disagree on the same double exactly at half grid
    * points — Spark rounds the SHORTEST-DECIMAL string of the double
    * (Double.toString → BigDecimal HALF_UP), DuckDB rounds a scaled
    * multiply — so rationals with small denominators (window means,
    * n/2-style averages) can hash-diverge (observed on q217:
    * 5.5697275 → 5.569727 vs 5.569728). Use THIS whenever the value
    * being rounded is a small-denominator rational; mirror in SQL as
    * floor(x * CAST(10^s AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
    * CAST(10^s AS DOUBLE). Negative values round half toward +inf on
    * both engines — consistent, slightly different from HALF_UP's
    * away-from-zero, documented trade. */
  def pround(c: Column, s: Int): Column = {
    val m = math.pow(10.0, s)
    floor(c * lit(m) + lit(0.5d)).cast("double") / lit(m)
  }
}
