package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT two-sample KOLMOGOROV–SMIRNOV drift, all key pairs (the
  * distribution-shift question r32's proportion canary can't answer:
  * did the SHAPE of the value distribution move, not just a rate?).
  *
  * D = max over the value axis of |F_a(v) − F_b(v)|. Both ECDFs step
  * only at observed values, so D is exactly max |cumA·n_b − cumB·n_a|
  * / (n_a·n_b) — INTEGER cross-multiplication (DECIMAL(38,0) folds, no
  * overflow at any corpus size) with ONE IEEE division at the very
  * end, which makes the whole statistic oracle-exact with no float
  * accumulation anywhere.
  *
  * Shape at scale — NO global window: the (value, per-key count)
  * histogram range-partitions on the value axis and each key's
  * cumulative count assembles as per-partition cumsum + a
  * #partitions-row offset frame (the packSequences discipline; the
  * histogram is sealed because the ranged frame feeds both the local
  * cumsums and the offset totals, and a twice-evaluated
  * repartitionByRange can sample different bounds). Keys are the
  * monitored population (bounded, loud ≤ maxKeys — the r16
  * contract); pair maxes fold as |pairs| aggregate expressions over
  * the value-grain frame and reshape to rows on a 1-row frame.
  *
  * Output per (key_a < key_b): n_a, n_b, d_stat, and the 95%
  * two-sample rejection flag (c(0.05) = 1.358 — Smirnov's asymptotic
  * critical value, the literal bit-shared with the oracle).
  */
object Stats {

  def ksAllPairs(df: DataFrame, keyCol: String, xCol: String,
                 maxKeys: Int = 16): DataFrame = {
    val keys = df.select(col(keyCol).cast("string").as("_k"))
      .where(col("_k").isNotNull).distinct()
      .orderBy("_k").collect().map(_.getString(0)).toSeq
    require(keys.size >= 2 && keys.size <= maxKeys,
      s"ksAllPairs: ${keys.size} keys; need 2..$maxKeys (keys are the " +
        "monitored population — raise maxKeys only with a bound in hand)")
    val n = keys.size
    val idx = keys.indices
    val hist = df
      .select(col(keyCol).cast("string").as("_k"), col(xCol).as("_x"))
      .groupBy(col("_x"))
      .agg(sum(when(col("_k") === keys.head, 1L).otherwise(0L)).as("_c0"),
        idx.tail.map(i =>
          sum(when(col("_k") === keys(i), 1L).otherwise(0L)).as(s"_c$i")): _*)
    val ranged = Caching.sealOver(
      hist.repartitionByRange(col("_x")).withColumn("_pid", spark_partition_id()))
    val w = Window.partitionBy("_pid").orderBy("_x")
    val local = ranged.select(
      col("_x") +: col("_pid") +:
        idx.map(i => sum(col(s"_c$i")).over(w).as(s"_l$i")): _*)
    val offW = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per range partition; the un-partitioned window scans
    // #partitions rows, not the value axis
    val offs = ranged.groupBy(col("_pid"))
      .agg(sum(col("_c0")).as("_t0"),
        idx.tail.map(i => sum(col(s"_c$i")).as(s"_t$i")): _*)
      .select(col("_pid") +:
        idx.map(i => coalesce(sum(col(s"_t$i")).over(offW), lit(0L))
          .as(s"_o$i")): _*)
    val totals = ranged.agg(sum(col("_c0")).as("_n0"),
      idx.tail.map(i => sum(col(s"_c$i")).as(s"_n$i")): _*)
    val cum = local.join(broadcast(offs), Seq("_pid"))
      .select(col("_x") +:
        idx.map(i => (col(s"_l$i") + col(s"_o$i")).as(s"_F$i")): _*)
      .crossJoin(broadcast(totals))
    val pairs = for { i <- idx; j <- idx if i < j } yield (i, j)
    def cross(i: Int, j: Int): Column =
      abs(col(s"_F$i").cast("decimal(19,0)") * col(s"_n$j").cast("decimal(19,0)")
        - col(s"_F$j").cast("decimal(19,0)") * col(s"_n$i").cast("decimal(19,0)"))
    val folded = cum.agg(
      max(cross(pairs.head._1, pairs.head._2)).as("_d0"),
      pairs.tail.zipWithIndex.map { case ((i, j), p) =>
        max(cross(i, j)).as(s"_d${p + 1}")
      } ++ idx.map(i => max(col(s"_n$i")).as(s"_m$i")): _*)
    val stackExpr = s"stack(${pairs.size}, " + pairs.zipWithIndex.map {
      case ((i, j), p) =>
        s"'${keys(i)}', '${keys(j)}', _m$i, _m$j, _d$p"
    }.mkString(", ") + ") as (key_a, key_b, _na, _nb, _dm)"
    folded.select(expr(stackExpr))
      .select(col("key_a"), col("key_b"),
        col("_na").as("n_a"), col("_nb").as("n_b"),
        round(col("_dm").cast("double") / col("_na").cast("double")
          / col("_nb").cast("double"), 6).as("d_stat"),
        (col("_dm").cast("double") / col("_na").cast("double")
          / col("_nb").cast("double")
          > lit(1.358) * sqrt((col("_na") + col("_nb")).cast("double")
            / (col("_na").cast("double") * col("_nb").cast("double"))))
          .as("reject_95"))
      .orderBy("key_a", "key_b")
  }

  /** The DuckDB oracle (keys passed as the literal sorted domain —
    * the oracle replays the cumsums as plain global windows; the
    * distribution machinery is Spark's concern, the VALUES must
    * match). Division / critical-value text mirrors the op exactly. */
  def ksOracleSql(table: String, keyCol: String, xCol: String,
                  keys: Seq[String]): String = {
    val idx = keys.indices
    val hCols = idx.map(i =>
      s"sum(CASE WHEN $keyCol = '${keys(i)}' THEN 1 ELSE 0 END) AS c$i")
      .mkString(",\n                ")
    val fCols = idx.map(i => s"sum(c$i) OVER (ORDER BY x) AS f$i")
      .mkString(",\n                ")
    val tCols = idx.map(i => s"CAST(sum(c$i) AS BIGINT) AS n$i")
      .mkString(", ")
    val pairs = for { i <- idx; j <- idx if i < j } yield (i, j)
    val dCols = pairs.map { case (i, j) =>
      s"max(abs(CAST(f$i AS DECIMAL(19,0)) * CAST(n$j AS DECIMAL(19,0)) " +
        s"- CAST(f$j AS DECIMAL(19,0)) * CAST(n$i AS DECIMAL(19,0)))) AS d${i}_$j"
    }.mkString(",\n                ")
    val rows = pairs.map { case (i, j) =>
      s"""SELECT '${keys(i)}' AS key_a, '${keys(j)}' AS key_b,
                 n$i AS n_a, n$j AS n_b,
                 round(CAST(d${i}_$j AS DOUBLE) / CAST(n$i AS DOUBLE)
                   / CAST(n$j AS DOUBLE), 6) AS d_stat,
                 CAST(d${i}_$j AS DOUBLE) / CAST(n$i AS DOUBLE)
                   / CAST(n$j AS DOUBLE)
                   > 1.358 * sqrt(CAST(n$i + n$j AS DOUBLE)
                     / (CAST(n$i AS DOUBLE) * CAST(n$j AS DOUBLE)))
                   AS reject_95
          FROM d, t"""
    }.mkString("\n              UNION ALL ")
    s"""WITH h AS (SELECT $xCol AS x,
                $hCols
              FROM $table WHERE $keyCol IS NOT NULL GROUP BY 1),
            f AS (SELECT x, $fCols FROM h),
            t AS (SELECT $tCols FROM h),
            d AS (SELECT $dCols FROM f, t)
         SELECT * FROM ($rows) ORDER BY key_a, key_b"""
  }
}
