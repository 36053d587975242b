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
