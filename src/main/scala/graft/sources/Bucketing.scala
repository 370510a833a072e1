package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables ONCE at write time
  * so every later equi-join / aggregation on the bucket key runs
  * shuffle-free.
  *
  * At 100 TB this is the difference between re-shuffling the fact
  * table on every query and never shuffling it at all: two tables
  * bucketed by the same key into the same bucket count join with zero
  * Exchange on either side (SortMergeJoin over co-located buckets).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table) // managed: location comes from the warehouse dir

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Hive-style partitioned layout (`.../key=value/part-*.parquet`):
    * the data layout that makes time/tenant filters prune whole
    * directories at planning time — at 100 TB a day-filter over a
    * date-partitioned corpus reads 1/Nth of the files before a single
    * row is scanned. Pair with a `PartitionFilters` plan assertion.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.format("parquet").partitionBy(partitionCols: _*)
      .mode("overwrite").save(path)

  /** Range-clustered parquet: repartitionByRange + sortWithinPartitions
    * on the cluster key before writing, so each output file owns a
    * DISJOINT key range. Parquet then records tight min/max stats per
    * file/row-group, and any later point or range filter on the key
    * skips every non-overlapping file — the poor man's index, and at
    * 100 TB the difference between scanning a shard and scanning the
    * corpus. Use for the one or two columns queries actually filter
    * on; for equi-join keys prefer [[writeBucketed]].
    */
  def writeRangeClustered(df: DataFrame, path: String, key: String,
                          numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.format("parquet").mode("overwrite").save(path)
  }
}
