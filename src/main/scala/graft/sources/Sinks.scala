package graft.sources

import org.apache.spark.sql.DataFrame

/** K1 — partitioned parquet sink with idempotent partition rebuild
  * (SURVEY.md §2.2). The reference appends to per-year HDF5 files with
  * per-month table keys and removes a key before rewriting it
  * (SFMuniDataHelper.py:28-39,583-584; GTFSHelper.py:169-171). Spark-first:
  * `partitionBy(year, month)` + dynamic partition overwrite — only the
  * partitions present in the incoming DataFrame are replaced, everything
  * else is untouched, and downstream scans get partition pruning for free.
  */
object Sinks {

  /** Recursive local delete (idempotent; tolerates a vanished dir). */
  def rmrf(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(path))
  }

  /** Rows are clustered by the partition columns before the write: without
    * it, EVERY upstream task holding rows of a partition value opens its
    * own file in that directory — at 1000 executors that is up to 1000
    * small files per partition, the canonical small-files incident. One
    * exchange at write time buys one file per partition value (AQE
    * coalesces the tiny post-shuffle tasks). Callers with very large
    * single partitions can pre-salt; for the month/year grains this sink
    * serves, one file per partition is the right layout. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** K1+ — bucketed table sink: pre-shuffle a fact table by its join key
    * at WRITE time (hash buckets + per-bucket sort), so every subsequent
    * equi-join or aggregation on that key plans with ZERO shuffle
    * exchanges — the bucketing IS the exchange, paid once and amortized
    * over every downstream query. The 100 TB fact-to-fact join pattern
    * (two tables bucketed the same way co-locate bucket-for-bucket);
    * ScaleMechanicsSpec asserts the exchange-free plan, q99 puts the
    * round-trip under the correctness oracle. */
  def writeBucketed(
      df: DataFrame, table: String, buckets: Int, bucketCol: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // external table at a per-process scratch location: the default
    // spark-warehouse directory is SHARED across processes even though
    // the in-memory catalog is not, so two concurrent runs creating the
    // same table name would race each other's files (the q46-style
    // scratch race, sink flavor). Scratch.dir is unique per JVM.
    val loc = Scratch.dir(s"bkt_$table")
    rmrf(loc)
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("path", loc)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }
}
