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

  /** EXACT equi-width HISTOGRAM (q48's companion: the profile says
    * null/distinct, the histogram says SHAPE — the first chart every
    * DQ dashboard draws). The classic float pitfall is the bin
    * boundary: floor((x−lo)/w) with an IEEE width w puts boundary
    * values in engine-dependent bins. Here values quantize to scaled
    * BIGINTs (`scale` decimal places) and the bin is pure integer
    * arithmetic — ((xi−lo)·bins) div (hi−lo), clamped to bins−1 —
    * so assignment is engine-neutral by construction. Edges render
    * once at the end in one pinned IEEE chain over exact integers.
    *
    * EMPTY BINS ARE ROWS (count 0): a histogram that silently drops
    * empty bins draws a different shape. The bin axis generates from
    * a range frame and left-joins the counts.
    *
    * Shape at scale: one min/max/count aggregate (broadcast 1-row),
    * one bin-grain aggregate with map-side combine; the bin axis is
    * |bins| rows. Degenerate lo == hi collapses to bin 0 by the
    * clamp, never a division by zero.
    */
  def histogram(df: DataFrame, xCol: String, bins: Int,
                scale: Int = 2): DataFrame = {
    require(bins >= 1 && bins <= 10000, s"histogram: bins $bins not in [1, 10000]")
    val spark = df.sparkSession
    val xi = df.select(
        (col(xCol).cast(s"decimal(18,$scale)") * lit(math.pow(10, scale).toLong))
          .cast("long").as("_xi"))
      .where(col("_xi").isNotNull)
    val mm = xi.agg(min(col("_xi")).as("_lo"), max(col("_xi")).as("_hi"),
      count(lit(1)).as("_n"))
    val counts = xi.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(lit(bins - 1L),
            // ALL-decimal bin arithmetic: operands cast to
            // DECIMAL(38,0) INDIVIDUALLY before subtracting (r16
            // ADVICE) — a domain whose scaled SPAN alone exceeds
            // Long.MaxValue would wrap in long subtraction before any
            // decimal cast could save it, and the span × bins product
            // passes Long.MaxValue sooner still (r15 ADVICE); Spark
            // (non-ANSI) wraps both silently to a WRONG BIN while
            // DuckDB's HUGEINT stays exact. The quotient is ≤ bins,
            // so `div`'s long result is safe.
            expr(s"((CAST(_xi AS DECIMAL(38,0)) - CAST(_lo AS DECIMAL(38,0)))" +
              s" * $bins) div (CAST(_hi AS DECIMAL(38,0))" +
              s" - CAST(_lo AS DECIMAL(38,0)))"))))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val denom = lit(math.pow(10, scale))
    spark.range(bins).select(col("id").as("bin"))
      .join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(mm))
      .select(col("bin"),
        round((col("_lo").cast("double") + col("bin").cast("double")
          * (col("_hi").cast("double") - col("_lo").cast("double"))
          / lit(bins.toDouble)) / denom, 6).as("lo_edge"),
        round((col("_lo").cast("double") + (col("bin") + lit(1L)).cast("double")
          * (col("_hi").cast("double") - col("_lo").cast("double"))
          / lit(bins.toDouble)) / denom, 6).as("hi_edge"),
        col("n"),
        round(col("n").cast("double") / col("_n").cast("double"), 6)
          .as("share"))
      .orderBy("bin")
  }
}
