package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical data-layout keys — the clustering lever that turns
  * multi-dimensional range predicates into file/partition pruning at
  * 100 TB. Sorting (or partitioning) a table by a Z-order key co-locates
  * rows that are close in ALL interleaved dimensions, so a k-D box
  * predicate touches a handful of z-tiles instead of every file: min/max
  * column statistics and partition values both become selective on the
  * single interleaved key. The key is a pure bit-interleave expression —
  * engine-portable (shift/and/or mean the same in DuckDB),
  * codegen-friendly, zero UDF.
  */
object Layout {

  /** Morton / Z-order key over k >= 2 non-negative int columns:
    * interleave the low `bits` bits of each, column c in positions
    * {c, c+k, c+2k, ...} — bit i of column c lands at position i*k + c,
    * so z = Σ_c Σ_i ((col_c >> i) & 1) << (i*k + c). The 2-column case
    * reduces to the classic x-even / y-odd Morton code. k·bits output
    * bits (capped at a long's 63); callers clamp/bucket inputs into
    * [0, 2^bits). */
  def zorderKeyN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"need at least 2 columns to interleave, got $k")
    require(bits >= 1 && k * bits <= 63,
      s"k*bits = ${k * bits} must fit a positive long (<= 63)")
    // long lanes throughout: interleaved positions exceed an int's shift
    // range (int shifts wrap mod 32) well before the k*bits <= 63 cap
    cols.zipWithIndex.flatMap { case (c, ci) =>
      val cl = c.cast("long")
      (0 until bits).map { i =>
        shiftleft(shiftright(cl, i).bitwiseAND(lit(1L)), i * k + ci)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Morton / Z-order key: interleave the low `bits` bits of two
    * non-negative int columns, x in the even positions, y in the odd —
    * z = Σ_i ((x>>i & 1) << 2i) | ((y>>i & 1) << (2i+1)).
    * 2·bits output bits; callers clamp/bucket inputs into [0, 2^bits).
    */
  def zorderKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    zorderKeyN(Seq(x, y), bits)
  }

  /** The z-tile (cluster/partition id) containing a key for a k-way
    * interleave: dropping the low k·tileBits bits yields aligned
    * (2^tileBits)^k hypercube tiles — the natural file/partition
    * granularity for a z-clustered table. */
  def zTileN(zkey: Column, tileBits: Int, k: Int): Column =
    shiftright(zkey, k * tileBits)

  /** 2-D [[zTileN]]: aligned 2^tileBits × 2^tileBits tiles. */
  def zTile(zkey: Column, tileBits: Int): Column =
    zTileN(zkey, tileBits, 2)
}
