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

  /** DYNAMIC partition overwrite — incremental re-curation: replace
    * ONLY the partitions present in `df`, leaving every other
    * partition's files untouched (static overwrite mode would delete
    * the whole table first). This is how one corrupted day / one
    * re-gated language shard re-curates in place at 100 TB — the
    * pipeline re-runs on the affected slice and rewrites 1/Nth of
    * the corpus; the untouched partitions are never read, never
    * rewritten, and stay visible to concurrent readers. The option
    * is per-write (no session-level config flip), so surrounding
    * static-mode writes keep their semantics.
    */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: String*): Unit =
    df.write.format("parquet").partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", "dynamic")
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

  /** Z-ORDER clustered writes: range clustering gives footer-stat
    * skipping on ONE column; interleaving the bit patterns of TWO
    * columns' rank indices (the Morton / Z-order curve) gives
    * partial locality on BOTH, so parquet min/max pruning helps
    * filters on either column — the standard lakehouse layout for
    * two-dimensional selective scans (user × time, key × metric).
    *
    * Both columns map to `2^bits` quantile buckets via cut points
    * from ONE mergeable-sketch aggregate (approx_percentile, the q25
    * device — an exact rank window would be a SinglePartition
    * bottleneck at precisely the scale this layout targets); each
    * row then buckets by counting cut points below it in a compact
    * fold over the literal cut array. The z-value interleaves the
    * two bucket indices' bits and the frame range-partitions + sorts
    * on it. Numeric columns only; `bits` ≤ 16 keeps the z-value in a
    * long. Write-time cost: one sketch aggregate + one narrow pass +
    * one range exchange — paid once, amortized over every pruned
    * read. Quantile approximation only skews bucket POPULATIONS, not
    * correctness: pruning reads real footer min/max either way.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int, bits: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 16, s"writeZOrdered: bits $bits not in [1,16]")
    // the temp columns would silently clobber (and then drop) any
    // user column sharing their name — refuse loudly instead
    Seq("_ba", "_bb", "_z").foreach(c => require(!df.columns.contains(c),
      s"writeZOrdered: input already has a column named $c"))
    val n = 1L << bits
    val qs = (1L until n).map(i => i.toDouble / n)
    // interpolated names are backtick-quoted so spaces, dots, hyphens
    // and reserved words survive the SQL round-trip (writeClustered
    // gets this for free from the Column API)
    def bq(c: String) = "`" + c.replace("`", "``") + "`"
    val cutsRow = df.agg(
      expr(s"approx_percentile(CAST(${bq(colA)} AS DOUBLE), array(${qs.mkString(",")}), 10000)"),
      expr(s"approx_percentile(CAST(${bq(colB)} AS DOUBLE), array(${qs.mkString(",")}), 10000)"))
      .head()
    // an empty frame or an all-NULL column has no quantiles — a bare
    // NPE from the cut literals would name neither the column nor the
    // cause
    require(!cutsRow.isNullAt(0) && !cutsRow.isNullAt(1),
      s"writeZOrdered: no non-NULL values to quantile in " +
        s"${if (cutsRow.isNullAt(0)) colA else colB} (empty input?)")
    def bucket(c: String, cuts: Seq[Double]) = expr(
      s"""aggregate(array(${cuts.mkString(",")}), 0L,
            (acc, x) -> acc + CASE WHEN CAST(${bq(c)} AS DOUBLE) >= x THEN 1L ELSE 0L END)""")
    val withB = df
      .withColumn("_ba", bucket(colA, cutsRow.getSeq[Double](0)))
      .withColumn("_bb", bucket(colB, cutsRow.getSeq[Double](1)))
    val z = (0 until bits).map { i =>
      (shiftright(col("_ba"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))) +
        (shiftright(col("_bb"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
    }.reduce(_ + _)
    withB.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_ba", "_bb", "_z")
      .write.format("parquet").mode("overwrite").save(path)
  }
}
