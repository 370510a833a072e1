package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-level DATA-QUALITY PROFILE (the audit every warehouse runs
  * before trusting a new feed): per column — row count, null count,
  * null rate, blank count (empty after trim), exact distinct count.
  *
  * Only FORMAT-INDEPENDENT metrics on purpose: the per-column values
  * funnel through one string cast so heterogeneous columns share a
  * schema, and every emitted metric is invariant to how an engine
  * prints a double or a timestamp (null-ness, blank-ness and distinct
  * COUNTS survive any injective cast; min/max/length of the string
  * form would not — they'd pin one engine's formatter).
  *
  * Shape at scale: the stack() generator is map-side row
  * multiplication (|cols|×, the same mass a multi-distinct Expand
  * pays) feeding ONE (col_name, value) partial-aggregated shuffle —
  * the distinct-pair space, not the row space, crosses the wire. No
  * driver-side per-column loop: one plan profiles every column.
  */
object Profile {

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columnProfile: unknown columns $missing")
    val stackExpr = s"stack(${cols.length}, " +
      cols.map(c => s"'$c', cast(`$c` as string)").mkString(", ") +
      ") as (col_name, _v)"
    df.select(expr(stackExpr))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_v").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(trim(col("_v")) === "", 1L).otherwise(0L)).as("n_blank"),
        countDistinct(col("_v")).as("n_distinct"))
      .withColumn("null_rate",
        round(col("n_null").cast("double") / col("n_rows").cast("double"), 6))
  }
}
