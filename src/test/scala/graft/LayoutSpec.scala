package graft

import graft.operators.Layout
import graft.sources.Scratch
import org.apache.spark.sql.functions._

/** Z-order layout: bit-interleave correctness against hand-computed
  * keys, tile locality of box predicates, and the actual partition
  * pruning a z-clustered write buys at read time.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey: hand-computed interleaves and round-trip coverage") {
    // x=3 (011), y=5 (101), 3 bits: z = x0 + 2·y0 + 4·x1 + 8·y1 + 16·x2 + 32·y2
    //   = 1 + 2 + 4 + 0 + 0 + 32 = 39
    val out = Seq((3, 5), (0, 0), (7, 7), (1, 0), (0, 1))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey(col("x"), col("y"), 3).as("z"))
      .as[(Int, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out((3, 5)) == 39)
    assert(out((0, 0)) == 0)
    assert(out((7, 7)) == 63)
    assert(out((1, 0)) == 1)
    assert(out((0, 1)) == 2)
    // bijectivity over the full 3-bit grid: 64 distinct keys in [0, 64)
    val all = spark.range(64)
      .select((col("id") % 8).cast("int").as("x"),
        (col("id") / 8).cast("int").as("y"))
      .select(Layout.zorderKey(col("x"), col("y"), 3).as("z"))
      .as[Long].collect().toSet
    assert(all == (0L until 64L).toSet)
  }

  test("zorderKey: wide inputs — 20-bit lanes interleave without wrapping") {
    // (2^19, 2^19): x bit 19 -> position 38, y bit 19 -> position 39
    val z = Seq((1 << 19, 1 << 19)).toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y"), 20).as("z"))
      .as[Long].collect().head
    assert(z == (1L << 38 | 1L << 39), s"got $z")
  }

  test("zTile: an aligned 16x16 box lives in exactly one tile; unaligned in 4") {
    def tilesOf(x0: Int, y0: Int): Set[Long] = {
      val rows = for (x <- x0 until x0 + 16; y <- y0 until y0 + 16) yield (x, y)
      rows.toDF("x", "y")
        .select(Layout.zTile(
          Layout.zorderKey(col("x"), col("y"), 8), 4).as("t"))
        .as[Long].collect().toSet
    }
    assert(tilesOf(32, 96).size == 1, "tile-aligned box → one 16x16 z-tile")
    assert(tilesOf(40, 100).size == 4, "box straddling both axes → 4 tiles")
  }

  test("zorderKeyN: 3-way hand-computed interleave, bijectivity, and 2-way equivalence") {
    // x=3 (011), y=5 (101), w=6 (110), 3 bits, k=3:
    // bit i of col c -> position 3i + c
    //   x: bits 0,1 -> pos 0, 3        = 1 + 8
    //   y: bits 0,2 -> pos 1, 7        = 2 + 128
    //   w: bits 1,2 -> pos 5, 8        = 32 + 256
    val z = Seq((3, 5, 6)).toDF("x", "y", "w")
      .select(Layout.zorderKeyN(
        Seq(col("x"), col("y"), col("w")), 3).as("z"))
      .as[Long].collect().head
    assert(z == (1 + 8 + 2 + 128 + 32 + 256), s"got $z")
    // bijectivity over the full 2-bit 3-D grid: 64 distinct keys in [0, 64)
    val all = spark.range(64)
      .select((col("id") % 4).cast("int").as("x"),
        (col("id") / 4 % 4).cast("int").as("y"),
        (col("id") / 16).cast("int").as("w"))
      .select(Layout.zorderKeyN(Seq(col("x"), col("y"), col("w")), 2).as("z"))
      .as[Long].collect().toSet
    assert(all == (0L until 64L).toSet)
    // k=2 must be bit-compatible with the classic 2-D key
    val pairs = spark.range(1024)
      .select((col("id") % 32).cast("int").as("x"),
        (col("id") / 32).cast("int").as("y"))
    val mismatch = pairs.where(
      Layout.zorderKeyN(Seq(col("x"), col("y")), 5) =!=
        Layout.zorderKey(col("x"), col("y"), 5)).count()
    assert(mismatch == 0, "zorderKeyN(k=2) diverges from zorderKey")
    // wide lanes: 3 cols x 21 bits = 63 positions, top bit exercised
    val wide = Seq((1 << 20, 1 << 20, 1 << 20)).toDF("x", "y", "w")
      .select(Layout.zorderKeyN(Seq(col("x"), col("y"), col("w")), 21).as("z"))
      .as[Long].collect().head
    assert(wide == ((1L << 60) | (1L << 61) | (1L << 62)), s"got $wide")
  }

  test("zTileN: an aligned 4x4x4 cube lives in one tile; unaligned in 8") {
    def tilesOf(x0: Int, y0: Int, w0: Int): Set[Long] = {
      val rows = for {
        x <- x0 until x0 + 4; y <- y0 until y0 + 4; w <- w0 until w0 + 4
      } yield (x, y, w)
      rows.toDF("x", "y", "w")
        .select(Layout.zTileN(Layout.zorderKeyN(
          Seq(col("x"), col("y"), col("w")), 6), 2, 3).as("t"))
        .as[Long].collect().toSet
    }
    assert(tilesOf(8, 16, 32).size == 1, "tile-aligned cube → one 4^3 z-tile")
    assert(tilesOf(10, 18, 34).size == 8, "cube straddling all axes → 8 tiles")
  }

  test("3-col z-clustered write prunes partitions for a box predicate") {
    val dir = Scratch.dir("zorder3_spec")
    // full 32^3 grid, 4x4x4 tiles -> 512 zb partitions
    val data = spark.range(32L * 32 * 32)
      .select((col("id") % 32).cast("int").as("x"),
        (col("id") / 32 % 32).cast("int").as("y"),
        (col("id") / 1024).cast("int").as("w"))
      .withColumn("zb", Layout.zTileN(
        Layout.zorderKeyN(Seq(col("x"), col("y"), col("w")), 5), 2, 3))
    data.write.mode("overwrite").partitionBy("zb").parquet(s"$dir/zt")
    // an aligned 4x4x4 box lives in ONE of the 512 zb partitions
    val boxTiles = data
      .where(col("x").between(8, 11) && col("y").between(16, 19) &&
        col("w").between(4, 7))
      .select("zb").distinct().as[Long].collect()
    assert(boxTiles.length == 1)
    val pruned = spark.read.parquet(s"$dir/zt")
      .where(col("zb") === boxTiles.head)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("zb"),
      s"zb must prune at the scan:\n$scan")
    assert(pruned.count() == 64L)
  }

  test("z-clustered write prunes partitions for a box predicate") {
    val dir = Scratch.dir("zorder_spec")
    val data = spark.range(256 * 256)
      .select((col("id") % 256).cast("int").as("x"),
        (col("id") / 256).cast("int").as("y"))
      .withColumn("zb", Layout.zTile(
        Layout.zorderKey(col("x"), col("y"), 8), 4))
    data.write.mode("overwrite").partitionBy("zb").parquet(s"$dir/zt")
    // the aligned box's rows live in ONE of the 256 zb partitions; a
    // reader pushing zb = <tile> scans 1/256 of the table
    val boxTiles = data
      .where(col("x").between(32, 47) && col("y").between(96, 111))
      .select("zb").distinct().as[Long].collect()
    assert(boxTiles.length == 1)
    val pruned = spark.read.parquet(s"$dir/zt")
      .where(col("zb") === boxTiles.head)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    val partFilters = scan.toString
    assert(partFilters.contains("PartitionFilters") &&
      partFilters.contains("zb"), s"zb must prune at the scan:\n$partFilters")
    assert(pruned.count() == 256L)
  }
}
