package graft

import graft.operators.Windows
import org.apache.spark.sql.functions._

/** A3/W9 month-grain parity: the window-based `imputeMonthChain` must
  * equal the reference's LITERAL sequential algorithm
  * (SFMuniDataAggregator.py:417-464) — a month-by-month walk where each
  * month left-joins the previous AVAILABLE month's already-imputed
  * output, imputes where OBS==0 with IMP = OBS_prev + IMP_prev (pandas
  * NaN propagating through missing prev rows), and leaves the first
  * month's initialized IMP=0 untouched.
  */
class MonthImputeSpec extends SparkSpec {
  import spark.implicits._

  // (key, monthIdx, obs, value) — observed-only grain: value null when
  // obs=0. Shapes covered: multi-month chains, a calendar gap the chain
  // crosses (month 4 absent globally: months 3 -> 5 are ADJACENT in the
  // store), a key dropping out of an intermediate month (T absent from
  // month 2, which exists globally -> T's chain breaks with NaN IMP and
  // the NaN propagates to month 3), and an unobserved first month (U).
  private val rows: Seq[(String, Int, Long, Option[Double])] = Seq(
    ("R", 1, 5L, Some(100.0)), ("R", 2, 0L, None), ("R", 3, 0L, None),
    /* month 4 absent */        ("R", 5, 0L, None), ("R", 6, 3L, Some(200.0)),
    ("R", 7, 0L, None),
    ("S", 8, 2L, Some(50.0)), ("S", 9, 0L, None), ("S", 12, 0L, None),
    ("T", 1, 1L, Some(10.0)), /* T absent from month 2 */ ("T", 3, 0L, None),
    ("T", 5, 0L, None),
    ("U", 1, 0L, None), ("U", 2, 0L, None))

  /** The reference's algorithm, verbatim shape. IMP as Option[Long]:
    * None models pandas NaN (NaN + x = NaN). */
  private def sequentialReference(
      input: Seq[(String, Int, Long, Option[Double])])
      : Map[(String, Int), (Option[Double], Option[Long])] = {
    val months = input.map(_._2).distinct.sorted
    val byMonth = input.groupBy(_._2)
    // key -> (obs, value, imp)
    var store = Map.empty[(String, Int), (Long, Option[Double], Option[Long])]
    var prevMonth = -9999
    for (m <- months) {
      for ((k, _, obs, v) <- byMonth(m)) {
        var value = v
        var imp: Option[Long] = Some(0L) // df['IMP_TRIP_STOPS'] = 0.
        if (months.contains(prevMonth)) { // skips only the first month
          if (obs == 0) {
            store.get((k, prevMonth)) match {
              case Some((pObs, pV, pImp)) =>
                value = pV
                imp = pImp.map(_ + pObs) // NaN propagates
              case None => // left join found no prev row: NaN everywhere
                value = None
                imp = None
            }
          }
        }
        store += (k, m) -> ((obs, value, imp))
      }
      prevMonth = m
    }
    store.map { case ((k, m), (_, v, imp)) => (k, m) -> ((v, imp)) }
  }

  test("window imputeMonthChain == the sequential reference algorithm") {
    val df = rows.toDF("k", "midx", "obs", "v")
    val out = Windows.imputeMonthChain(df, Seq("k"), "midx", Seq("v"), "obs")
      .select(col("k"), col("midx"), col("v"), col("IMP_TRIP_STOPS"))
      .as[(String, Int, Option[Double], Option[Long])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val expected = sequentialReference(rows)
    assert(out == expected)
    // the load-bearing cells:
    assert(out(("R", 2)) == ((Some(100.0), Some(5L)))) // IMP = anchor's OBS
    assert(out(("R", 3)) == ((Some(100.0), Some(5L)))) // chained, telescoped
    assert(out(("R", 5)) == ((Some(100.0), Some(5L)))) // crosses the gap: 3 and 5 are adjacent in the store
    assert(out(("R", 6)) == ((Some(200.0), Some(0L)))) // observed: untouched
    assert(out(("R", 7)) == ((Some(200.0), Some(3L)))) // new anchor
    assert(out(("S", 12)) == ((Some(50.0), Some(2L))))
    assert(out(("T", 3)) == ((None, None)))            // key dropout -> NaN
    assert(out(("T", 5)) == ((None, None)))            // NaN propagates
    assert(out(("U", 1)) == ((None, Some(0L))))        // first month: initialized 0
    assert(out(("U", 2)) == ((None, Some(0L))))        // 0 + 0 telescopes
  }
}
