package graft

import graft.operators.{Clustering, Similarity}
import graft.sources.Scratch
import org.apache.spark.sql.functions._

/** The persisted IVF layout (writeIvfIndex / ivfPartitionedTopK) must be
  * exactly q81's search with the corpus assignment moved to build time:
  * result parity with the inline ivfTopK, probe-time partition pruning
  * visible in the plan (dynamic pruning from the broadcast probe join on
  * the partition column; static pruning for a literal cell predicate),
  * and one directory per cell on disk.
  */
class IvfLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val e = Tables.table(spark, sf, "embeddings")
  private lazy val cent = Clustering.labelCentroids(e, "label", "embedding")
  private lazy val idxPath = {
    val p = Scratch.dir("ivfspec")
    Similarity.writeIvfIndex(e, "vec_id", "embedding", cent, p)
    p
  }

  test("partitioned search matches the inline ivfTopK bit-for-bit") {
    val probes = e.where(col("vec_id") < 10)
    val inline = Similarity.ivfTopK(e, probes, "vec_id", "embedding",
        "vec_id", cent, k = 5, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val fromIndex = Similarity.ivfPartitionedTopK(probes, "vec_id",
        "embedding", cent, idxPath, k = 5, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(fromIndex == inline,
      "partitioned-index search diverges from the inline IVF search")
  }

  test("the index is one directory per cell and the scan dynamic-prunes on it") {
    val dirs = new java.io.File(idxPath).listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    val cells = cent.select("cell").collect().map(_.get(0).toString).sorted
    assert(dirs.toSeq == cells.map("cell=" + _).toSeq,
      s"expected one dir per cell, got ${dirs.mkString(",")}")
    // the probe join must reach the index scan as a runtime partition
    // filter: broadcast build side on the partition column -> Spark's
    // dynamic partition pruning (at 100 TB this is the difference
    // between reading nprobe inverted lists and reading the corpus)
    val probes = e.where(col("vec_id") < 10)
    val plan = Similarity.ivfPartitionedTopK(probes, "vec_id", "embedding",
        cent, idxPath, k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the index scan:\n$plan")
  }

  test("a literal cell predicate prunes statically to the named directories") {
    val one = spark.read.parquet(idxPath).where(col("cell") === 3)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(cell"),
      s"literal cell filter did not reach PartitionFilters:\n$scan")
    // and the pruned read returns exactly that cell's rows
    val all = spark.read.parquet(idxPath)
      .where(col("cell") === 3).count()
    assert(one.count() == all && all > 0)
  }

  test("incremental maintenance reconstructs exactly a full rebuild") {
    // build over the old slice, merge the arrivals with the FROZEN
    // quantizer, and the maintained (id, cell) content must equal an
    // index built over the union with the same centroids — and cells
    // that received no arrival must keep their original files
    val isOld = col("vec_id") % 7 =!= 0
    val oldCent = Clustering.labelCentroids(e.where(isOld), "label", "embedding")
    val p = Scratch.dir("ivfspec_inc")
    Similarity.writeIvfIndex(e.where(isOld), "vec_id", "embedding", oldCent, p)
    val untouched = Similarity.indexRows(e, "vec_id", "embedding", oldCent)
      .groupBy("cell").agg(sum(when(col("neighbor_id") % 7 === 0, 1)
        .otherwise(0)).as("arrivals"))
      .where(col("arrivals") === 0)
      .select("cell").collect().map(_.get(0).toString).toSet
    val before = untouched.map { c =>
      c -> new java.io.File(s"$p/cell=$c").listFiles().map(_.getName).toSet
    }.toMap
    graft.sources.Sinks.mergeIntoPartitioned(p,
      Similarity.indexRows(e.where(!isOld), "vec_id", "embedding", oldCent),
      Seq("neighbor_id"), Seq("cell"))
    val maintained = spark.read.parquet(p)
      .select(col("neighbor_id").cast("long"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = Similarity.indexRows(e, "vec_id", "embedding", oldCent)
      .select(col("neighbor_id").cast("long"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(maintained == rebuilt,
      "maintained index content diverges from a frozen-quantizer rebuild")
    before.foreach { case (c, files) =>
      val now = new java.io.File(s"$p/cell=$c").listFiles().map(_.getName).toSet
      assert(now == files, s"cell $c had no arrivals but its files changed")
    }
  }
}
