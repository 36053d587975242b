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

  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
