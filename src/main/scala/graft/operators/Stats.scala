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

  /** Shared distributed-ECDF machinery: collects the (loud-bounded)
    * key domain, builds the (value, per-key count) histogram, and
    * assembles each key's cumulative count with per-range-partition
    * cumsums + a #partitions-row offset frame — no global window.
    * Returns (keys, frame at value grain carrying _c$i (count at v),
    * _F$i (inclusive cum ≤ v), _n$i (totals, broadcast onto every
    * row)). */
  private def cumFrame(df: DataFrame, keyCol: String, xCol: String,
      maxKeys: Int, op: String): (Seq[String], DataFrame) = {
    val keys = df.select(col(keyCol).cast("string").as("_k"))
      .where(col("_k").isNotNull).distinct()
      .orderBy("_k").collect().map(_.getString(0)).toSeq
    require(keys.size >= 2 && keys.size <= maxKeys,
      s"$op: ${keys.size} keys; need 2..$maxKeys (keys are the " +
        "monitored population — raise maxKeys only with a bound in hand)")
    val idx = keys.indices
    // null values dropped on BOTH sides: Spark range-sorts nulls
    // first while DuckDB windows order them last — admitting them
    // would silently diverge the ECDFs on dirty data
    val hist = df
      .select(col(keyCol).cast("string").as("_k"), col(xCol).as("_x"))
      .where(col("_x").isNotNull)
      .groupBy(col("_x"))
      .agg(sum(when(col("_k") === keys.head, 1L).otherwise(0L)).as("_c0"),
        idx.tail.map(i =>
          sum(when(col("_k") === keys(i), 1L).otherwise(0L)).as(s"_c$i")): _*)
    val ranged = Caching.sealOver(
      hist.repartitionByRange(col("_x")).withColumn("_pid", spark_partition_id()))
    val w = Window.partitionBy("_pid").orderBy("_x")
    val local = ranged.select(
      col("_x") +: col("_pid") +: idx.map(i => col(s"_c$i")) ++:
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
      .select(col("_x") +: idx.map(i => col(s"_c$i")) ++:
        idx.map(i => (col(s"_l$i") + col(s"_o$i")).as(s"_F$i")): _*)
      .crossJoin(broadcast(totals))
    (keys, cum)
  }

  def ksAllPairs(df: DataFrame, keyCol: String, xCol: String,
                 maxKeys: Int = 16): DataFrame = {
    val (keys, cum) = cumFrame(df, keyCol, xCol, maxKeys, "ksAllPairs")
    val idx = keys.indices
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

  /** WEIGHTED MEDIAN per group (the volume-weighted "typical price"
    * the unweighted q11 median gets wrong when row counts and row
    * mass diverge): the smallest x whose cumulative weight reaches
    * half the group total (the lower weighted median — an exact
    * set-membership rule, no interpolation, so the answer is a REAL
    * data value and engine-neutral by construction).
    *
    * Weights fold as exact DECIMAL; the crossing test 2·cum ≥ total
    * is exact integer/decimal arithmetic — zero IEEE anywhere.
    * Equal-x tie runs are answer-invariant: rows inside a run get
    * cum in arbitrary intra-run order, but the run's LAST row always
    * carries the full run weight and every run row shares x, so
    * min(x) over crossing rows cannot depend on that order.
    *
    * Shape at scale: per-group cumulative weights assemble with the
    * packSequences discipline on the (key, x) range axis —
    * per-partition cumsum + a (#partitions × |keys|)-row offset frame
    * (the lengthBatches per-bucket variant), NO per-group global
    * window; group totals broadcast back; the crossing pick is one
    * min-aggregate.
    */
  def weightedMedian(df: DataFrame, keyCol: String, xCol: String,
                     wCol: String): DataFrame = {
    val base = df.select(col(keyCol).cast("string").as("_k"),
      col(xCol).cast("double").as("_x"),
      col(wCol).cast("decimal(18,6)").as("_w"))
      .where(col("_x").isNotNull && col("_w").isNotNull)
    val ranged = Caching.sealOver(
      base.repartitionByRange(col("_k"), col("_x"))
        .withColumn("_pid", spark_partition_id()))
    val local = ranged.withColumn("_lc",
      sum(col("_w")).over(Window.partitionBy("_pid", "_k").orderBy(col("_x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = ranged.groupBy(col("_pid"), col("_k"))
      .agg(sum(col("_w")).as("_pw"))
      .withColumn("_off", coalesce(
        sum(col("_pw")).over(Window.partitionBy("_k").orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)")))
      .select(col("_pid"), col("_k"), col("_off"))
    val totals = ranged.groupBy(col("_k")).agg(sum(col("_w")).as("_tot"))
    local.join(offs, Seq("_pid", "_k"))
      .withColumn("_cum", col("_lc") + col("_off"))
      .join(broadcast(totals), Seq("_k"))
      .filter(col("_cum") * lit(2) >= col("_tot"))
      .groupBy(col("_k"))
      .agg(min(col("_x")).as("w_median"),
        max(col("_tot")).cast("double").as("total_weight"))
      .select(col("_k").as(keyCol), col("w_median"), col("total_weight"))
      .orderBy(keyCol)
  }

  /** ABC ANALYSIS (the inventory-management classic beside q55's
    * Lorenz view: WHICH items make up the first 80% of value): items
    * rank by value DESC, class A while cumulative value ≤ 80% of the
    * total, B to 95%, C beyond — and the cuts are EXACT integer-
    * scaled decimal compares (cum·5 ≤ T·4, cum·20 ≤ T·19), never a
    * float threshold, so the classification is engine-neutral by
    * construction.
    *
    * Ranks come from the packSequences distributed prefix on the
    * DESCENDING value axis (range-partition on (−value-order, id) via
    * a desc sort column — no global window); (value, id) ties order
    * deterministically. Output: one row per class with exact counts,
    * DECIMAL value, and the share (one pinned division).
    */
  def abcAnalysis(df: DataFrame, idCol: String, xCol: String): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("_id"),
      col(xCol).cast("decimal(18,6)").as("_x"))
      .where(col("_x").isNotNull && col("_id").isNotNull)
    val ranged = Caching.sealOver(
      base.repartitionByRange(col("_x").desc, col("_id"))
        .withColumn("_pid", spark_partition_id()))
    val local = ranged.withColumn("_lc",
      sum(col("_x")).over(Window.partitionBy("_pid")
        .orderBy(col("_x").desc, col("_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = ranged.groupBy(col("_pid")).agg(sum(col("_x")).as("_pw"))
      .withColumn("_off", coalesce(
        sum(col("_pw")).over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)")))
      .select(col("_pid"), col("_off"))
    val totals = ranged.agg(sum(col("_x")).as("_t"))
    local.join(broadcast(offs), Seq("_pid"))
      .withColumn("_cum", col("_lc") + col("_off"))
      .crossJoin(broadcast(totals))
      .withColumn("abc_class",
        when(col("_cum") * lit(5) <= col("_t") * lit(4), "A")
          .when(col("_cum") * lit(20) <= col("_t") * lit(19), "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("_x")).cast("double"), 6).as("value"),
        round(sum(col("_x")).cast("double")
          / max(col("_t")).cast("double"), 6).as("value_share"))
      .orderBy("abc_class")
  }

  /** LORENZ CURVE + exact GINI coefficient (the concentration view
    * beside q35's Pareto top-share: HOW unequal is the whole
    * distribution, not just the head): Gini = 2·Σ(rank·x)/(n·Σx)
    * − (n+1)/n over values sorted ascending, with rank·x folding as
    * exact DECIMAL — so the coefficient is two pinned IEEE divisions
    * of exact folds, no float accumulation.
    *
    * The global rank is the packSequences distributed prefix COUNT
    * (range-partition on (x, id), per-partition row_number + a
    * #partitions-row offset frame — NO global window; the ranked
    * frame is sealed against double-evaluated range bounds). Ties
    * order deterministically by id, which leaves Σrank·x invariant
    * within a tie group only up to id order — hence the total order
    * REQUIREMENT on (x, id): ids must be unique (loud downstream
    * via the deterministic rank, same contract as packSequences).
    *
    * Output: one row per decile (cut by rank) with its exact
    * cumulative revenue share, plus the global gini on every row.
    */
  def lorenzGini(df: DataFrame, idCol: String, xCol: String): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("_id"),
      col(xCol).cast("decimal(18,6)").as("_x"))
      .where(col("_x").isNotNull && col("_id").isNotNull)
    val ranged = Caching.sealOver(
      base.repartitionByRange(col("_x"), col("_id"))
        .withColumn("_pid", spark_partition_id()))
    val local = ranged.withColumn("_lr",
      row_number().over(Window.partitionBy("_pid")
        .orderBy(col("_x"), col("_id"))))
    val offs = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    val ranked = local.join(broadcast(offs), Seq("_pid"))
      .withColumn("_r", col("_lr") + col("_off"))
    val totals = ranked.agg(count(lit(1)).as("_n"), sum(col("_x")).as("_t"),
      sum(col("_r").cast("decimal(19,0)") * col("_x")).as("_rx"))
    val gini = lit(2.0) * col("_rx").cast("double") /
      (col("_n").cast("double") * col("_t").cast("double")) -
      (col("_n") + lit(1L)).cast("double") / col("_n").cast("double")
    ranked
      .crossJoin(broadcast(totals))
      .withColumn("_dec", expr("(_r * 10 - 1) div _n + 1").cast("long"))
      .groupBy(col("_dec"), col("_n"), col("_t"), col("_rx"))
      .agg(count(lit(1)).as("n_members"), sum(col("_x")).as("_dx"))
      .withColumn("_cum", sum(col("_dx")).over(
        Window.orderBy("_dec")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("_dec").as("decile"),
        col("n_members").cast("long").as("n_members"),
        round(col("_cum").cast("double") / col("_t").cast("double"), 6)
          .as("cum_share"),
        round(gini, 6).as("gini"))
      .orderBy("decile")
  }

  /** CHI-SQUARE independence over two bounded categorical domains:
    * the full cross grid (absent cells keep their expected mass),
    * per-cell expected counts and standardized residuals as pinned
    * IEEE chains over exact integer totals, and the statistic as a
    * cumulative fold in pinned cell order — each term quantized to
    * DECIMAL(28,9) first, so NO engine's window fold order can move a
    * bit. The input aggregates ONCE into the sealed cell frame
    * (grid/domain/total branches would otherwise each re-scan); every
    * window runs on that ≤|rows|·|cols| frame. The LAST row's
    * cum_chi2 is the statistic; df rides every row.
    */
  def chi2Independence(df: DataFrame, rowCol: String,
                       colCol: String): DataFrame = {
    val obs = Caching.sealOver(
      df.groupBy(col(rowCol), col(colCol))
        .agg(count(lit(1)).cast("long").as("obs")))
    val grid = obs.select(rowCol).distinct()
      .crossJoin(obs.select(colCol).distinct())
      .join(obs, Seq(rowCol, colCol), "left")
      .na.fill(0L, Seq("obs"))
    val wr = Window.partitionBy(col(rowCol))
    val wc = Window.partitionBy(col(colCol))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(col(rowCol), col(colCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = sum(col("obs")).over(wr).cast("double") *
      sum(col("obs")).over(wc).cast("double") /
      sum(col("obs")).over(wAll).cast("double")
    grid
      .withColumn("_e", e)
      .withColumn("_res",
        (col("obs").cast("double") - col("_e")) / sqrt(col("_e")))
      .withColumn("_nr",
        size(collect_set(col(rowCol)).over(wAll)).cast("long"))
      .withColumn("_nc",
        size(collect_set(col(colCol)).over(wAll)).cast("long"))
      .select(col(rowCol), col(colCol), col("obs"),
        round(col("_e"), 6).as("expected"),
        round(col("_res"), 6).as("residual"),
        round(sum(round(col("_res") * col("_res"), 9)
          .cast("decimal(28,9)")).over(wCum).cast("double"), 6)
          .as("cum_chi2"),
        ((col("_nr") - 1L) * (col("_nc") - 1L)).as("df"))
      .orderBy(rowCol, colCol)
  }

  /** MANN–WHITNEY U rank-sum test, all key pairs (the nonparametric
    * A/B answer beside q51's KS: not "did the shape move" but "does
    * one arm stochastically dominate, and by how much"). From the
    * same histogram: 2·U_ij = Σ_v c_i(v)·(2·F_j(v) − c_j(v)) — U
    * counts key_a's WINS (pairs with a > b, ties half), so DOUBLED
    * units keep the fold exact integers (DECIMAL, order-free); the
    * tie-corrected normal z and the common-language effect size
    * AUC = U/(n_a·n_b) = P(a>b) + ½P(a=b)
    * derive in one pinned IEEE chain shared textually with the
    * oracle. Tie correction Σ(t³−t) folds exactly too (t = pooled
    * count at v, cube bounded ~10¹² per distinct value). All-tied
    * pairs have zero variance — z is NULL, not ±inf.
    */
  def mannWhitneyAllPairs(df: DataFrame, keyCol: String, xCol: String,
                          maxKeys: Int = 16): DataFrame = {
    val (keys, cum) = cumFrame(df, keyCol, xCol, maxKeys, "mannWhitneyAllPairs")
    val idx = keys.indices
    val pairs = for { i <- idx; j <- idx if i < j } yield (i, j)
    def dec(c: Column) = c.cast("decimal(19,0)")
    def u2(i: Int, j: Int): Column =
      sum(dec(col(s"_c$i")) * (dec(col(s"_F$j")) * lit(2) - dec(col(s"_c$j"))))
    def ties(i: Int, j: Int): Column = {
      val t = (col(s"_c$i") + col(s"_c$j")).cast("decimal(12,0)")
      sum(t * t * t - t)
    }
    val folded = cum.agg(
      u2(pairs.head._1, pairs.head._2).as("_u0"),
      pairs.tail.zipWithIndex.map { case ((i, j), p) =>
        u2(i, j).as(s"_u${p + 1}")
      } ++ pairs.zipWithIndex.map { case ((i, j), p) =>
        ties(i, j).as(s"_t$p")
      } ++ idx.map(i => max(col(s"_n$i")).as(s"_m$i")): _*)
    val stackExpr = s"stack(${pairs.size}, " + pairs.zipWithIndex.map {
      case ((i, j), p) =>
        s"'${keys(i)}', '${keys(j)}', _m$i, _m$j, _u$p, _t$p"
    }.mkString(", ") + ") as (key_a, key_b, _na, _nb, _u2, _tt)"
    val na = col("_na").cast("double")
    val nb = col("_nb").cast("double")
    val varU = na * nb / lit(12.0) *
      ((col("_na") + col("_nb") + lit(1L)).cast("double")
        - col("_tt").cast("double")
          / ((col("_na") + col("_nb")).cast("double")
            * (col("_na") + col("_nb") - lit(1L)).cast("double")))
    folded.select(expr(stackExpr))
      .select(col("key_a"), col("key_b"),
        col("_na").as("n_a"), col("_nb").as("n_b"),
        (col("_u2").cast("double") / lit(2.0)).as("u_stat"),
        round(col("_u2").cast("double") / lit(2.0) / na / nb, 6).as("auc"),
        when(varU > 0.0, round(
          ((col("_u2") - dec(col("_na")) * dec(col("_nb"))).cast("double")
            / lit(2.0)) / sqrt(varU), 6)).as("z_score"))
      .orderBy("key_a", "key_b")
  }

  /** Mann–Whitney oracle — same histogram/cumsum CTEs as KS, same
    * pinned division chain as the op. */
  def mwOracleSql(table: String, keyCol: String, xCol: String,
                  keys: Seq[String]): String = {
    val idx = keys.indices
    val hCols = idx.map(i =>
      s"sum(CASE WHEN $keyCol = '${keys(i)}' THEN 1 ELSE 0 END) AS c$i")
      .mkString(",\n                ")
    val fCols = (idx.map(i => s"c$i") ++
      idx.map(i => s"sum(c$i) OVER (ORDER BY x) AS f$i"))
      .mkString(",\n                ")
    val tCols = idx.map(i => s"CAST(sum(c$i) AS BIGINT) AS n$i")
      .mkString(", ")
    val pairs = for { i <- idx; j <- idx if i < j } yield (i, j)
    val dCols = pairs.map { case (i, j) =>
      s"sum(CAST(c$i AS DECIMAL(19,0)) * (CAST(f$j AS DECIMAL(19,0)) * 2 " +
        s"- CAST(c$j AS DECIMAL(19,0)))) AS u${i}_$j,\n                " +
        s"sum(CAST(c$i + c$j AS DECIMAL(12,0)) * CAST(c$i + c$j AS DECIMAL(12,0)) " +
        s"* CAST(c$i + c$j AS DECIMAL(12,0)) - CAST(c$i + c$j AS DECIMAL(12,0))) " +
        s"AS t${i}_$j"
    }.mkString(",\n                ")
    val rows = pairs.map { case (i, j) =>
      val vr = s"CAST(n$i AS DOUBLE) * CAST(n$j AS DOUBLE) / 12.0 * " +
        s"(CAST(n$i + n$j + 1 AS DOUBLE) - CAST(t${i}_$j AS DOUBLE) " +
        s"/ (CAST(n$i + n$j AS DOUBLE) * CAST(n$i + n$j - 1 AS DOUBLE)))"
      s"""SELECT '${keys(i)}' AS key_a, '${keys(j)}' AS key_b,
                 n$i AS n_a, n$j AS n_b,
                 CAST(u${i}_$j AS DOUBLE) / 2.0 AS u_stat,
                 round(CAST(u${i}_$j AS DOUBLE) / 2.0 / CAST(n$i AS DOUBLE)
                   / CAST(n$j AS DOUBLE), 6) AS auc,
                 CASE WHEN $vr > 0.0 THEN
                   round((CAST(u${i}_$j - CAST(n$i AS DECIMAL(19,0))
                       * CAST(n$j AS DECIMAL(19,0)) AS DOUBLE) / 2.0)
                     / sqrt($vr), 6)
                 END AS z_score
          FROM d, t"""
    }.mkString("\n              UNION ALL ")
    s"""WITH h AS (SELECT $xCol AS x,
                $hCols
              FROM $table WHERE $keyCol IS NOT NULL AND $xCol IS NOT NULL
              GROUP BY 1),
            f AS (SELECT x, $fCols FROM h),
            t AS (SELECT $tCols FROM h),
            d AS (SELECT $dCols FROM f)
         SELECT * FROM ($rows) ORDER BY key_a, key_b"""
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
              FROM $table WHERE $keyCol IS NOT NULL AND $xCol IS NOT NULL
              GROUP BY 1),
            f AS (SELECT x, $fCols FROM h),
            t AS (SELECT $tCols FROM h),
            d AS (SELECT $dCols FROM f, t)
         SELECT * FROM ($rows) ORDER BY key_a, key_b"""
  }

  /** SPEARMAN rank correlation per group (the monotone-association
    * question q43's Pearson gets wrong under heavy tails or a curved
    * relationship: rank first, THEN correlate). Ties take the
    * standard AVERAGE rank — kept exact by folding DOUBLED ranks
    * (2·avg_rank = 2·cntLess + cntEq + 1, always an integer; the q52
    * doubled-unit discipline), so every moment sum is an exact
    * DECIMAL fold and ρ derives in q43's one fixed IEEE
    * parenthesization — Pearson over doubled ranks, the doubling
    * cancelling in the ratio.
    *
    * Shape at scale — NO per-group row window anywhere: each
    * variable's doubled rank computes at VALUE GRAIN ((key, v) →
    * count) with the packSequences distributed prefix (per-range-
    * partition cumsum + offset frame), then the row stream picks up
    * (dx, dy) via two m:1 value-grain joins. The rank maps shrink by
    * the duplication factor; the joins shuffle on (key, value), never
    * collide a whole group into one task; the moment fold is one
    * aggregate with map-side combine.
    */
  def spearman(df: DataFrame, keyCol: String, xCol: String,
               yCol: String): DataFrame = {
    val base = df.select(col(keyCol).cast("string").as("_k"),
        col(xCol).cast("double").as("_x"), col(yCol).cast("double").as("_y"))
      .where(col("_k").isNotNull && col("_x").isNotNull && col("_y").isNotNull)

    // doubled average rank per (key, value): 2·F(v) − c(v) + 1 with F
    // the inclusive cumulative count off the distributed prefix
    def rankMap(vc: String): DataFrame = {
      val hist = base.groupBy(col("_k"), col(vc).as("_v"))
        .agg(count(lit(1)).as("_c"))
      val ranged = Caching.sealOver(
        hist.repartitionByRange(col("_k"), col("_v"))
          .withColumn("_pid", spark_partition_id()))
      val local = ranged.withColumn("_lc",
        sum(col("_c")).over(Window.partitionBy("_pid", "_k").orderBy(col("_v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val offs = ranged.groupBy(col("_pid"), col("_k"))
        .agg(sum(col("_c")).as("_pc"))
        .withColumn("_off", coalesce(
          sum(col("_pc")).over(Window.partitionBy("_k").orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("_pid"), col("_k"), col("_off"))
      local.join(offs, Seq("_pid", "_k"))
        .select(col("_k"), col("_v"),
          (lit(2L) * (col("_lc") + col("_off")) - col("_c") + lit(1L))
            .as("_dr"))
    }
    def dec(c: Column) = c.cast("decimal(38,0)")
    val g = base
      .join(rankMap("_x").select(col("_k"), col("_v").as("_x"),
        col("_dr").as("_dx")), Seq("_k", "_x"))
      .join(rankMap("_y").select(col("_k"), col("_v").as("_y"),
        col("_dr").as("_dy")), Seq("_k", "_y"))
      .groupBy(col("_k"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("_dx"))).cast("double").as("_sa"),
        sum(dec(col("_dy"))).cast("double").as("_sb"),
        sum(dec(col("_dx") * col("_dx"))).cast("double").as("_saa"),
        sum(dec(col("_dy") * col("_dy"))).cast("double").as("_sbb"),
        sum(dec(col("_dx") * col("_dy"))).cast("double").as("_sab"))
    val nD = col("n").cast("double")
    g.select(col("_k").as(keyCol), col("n"),
        round((nD * col("_sab") - col("_sa") * col("_sb")) /
          (sqrt(nD * col("_saa") - col("_sa") * col("_sa")) *
            sqrt(nD * col("_sbb") - col("_sb") * col("_sb"))), 6)
          .as("rho"))
      .orderBy(keyCol)
  }
}
