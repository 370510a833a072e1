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
}
