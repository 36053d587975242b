package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical data-layout keys — the clustering lever that turns
  * multi-dimensional range predicates into file/partition pruning at
  * 100 TB. Sorting (or partitioning) a table by a Z-order key co-locates
  * rows that are close in BOTH dimensions, so a 2-D box predicate touches
  * a handful of z-tiles instead of every file: min/max column statistics
  * and partition values both become selective on the single interleaved
  * key. The key is a pure bit-interleave expression — engine-portable
  * (shift/and/or mean the same in DuckDB), codegen-friendly, zero UDF.
  */
object Layout {

  /** Morton / Z-order key: interleave the low `bits` bits of two
    * non-negative int columns, x in the even positions, y in the odd —
    * z = Σ_i ((x>>i & 1) << 2i) | ((y>>i & 1) << (2i+1)).
    * 2·bits output bits; callers clamp/bucket inputs into [0, 2^bits).
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    // long lanes throughout: for bits > 15 the interleaved position
    // 2i+1 exceeds an int's shift range (int shifts wrap mod 32)
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The z-tile (cluster/partition id) containing a key: dropping the low
    * 2·tileBits bits yields aligned 2^tileBits × 2^tileBits tiles — the
    * natural file/partition granularity for a z-clustered table. */
  def zTile(zkey: Column, tileBits: Int): Column =
    shiftright(zkey, 2 * tileBits)
}
