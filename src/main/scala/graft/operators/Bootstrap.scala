package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic POISSON BOOTSTRAP confidence intervals (error bars
  * for a 100 TB mean without resampling the data): each replicate b
  * re-weights every row by a Poisson(1) draw — the online bootstrap
  * (Oza & Russell 2001) — so ALL B resamples fold in ONE pass as 2·B
  * aggregate expressions; no row multiplication, no second scan, no
  * driver-side resampling loop.
  *
  * Determinism is the r11 trick generalized: the draw for (row, b)
  * comes from comparing an md5-hex prefix of `id || "_b"` against the
  * Poisson(1) cumulative thresholds AS HEX STRINGS (floor(cum·16⁸)
  * rendered to 8 hex digits) — md5, substring, and string `<` agree
  * across engines, so a DuckDB oracle replays every draw exactly.
  * Weights are capped at 5 (cum P ≈ 0.9994; the tail mass lands on
  * the cap — a fixed, engine-neutral convention).
  *
  * Exactness: weighted sums fold as DECIMAL(18,6) products, each
  * replicate mean is ONE IEEE division of the exact fold, and the CI
  * is the percentile/quantile_cont pair (q11) over the B replicate
  * means at the group grain (B·|keys| rows — never the row space).
  */
object Bootstrap {

  /** floor(cumP(Poisson(1) ≤ k)·16⁸) as hex, k = 0..4; u ≥ last → 5 */
  private val hexThresholds =
    Seq("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797", "ff1025f5")

  /** One md5 yields FOUR independent 8-hex-digit draws (slices of the
    * 32-hex digest) — replicate b reads slice b%4 of hash group b/4,
    * quartering the md5 count per row (the q50 hot cost: B md5s per
    * row was 38M digests at sf0.1). STRING is the one text-type name
    * BOTH parsers accept (Spark rejects bare VARCHAR; DuckDB aliases
    * STRING to VARCHAR). */
  private def groupHashSql(idExpr: String, g: Int): String =
    s"md5(concat(CAST($idExpr AS STRING), '_$g'))"

  private def sliceSql(hashExpr: String, b: Int): String =
    s"substring($hashExpr, ${1 + 8 * (b % 4)}, 8)"

  /** Threshold CASE over a hex expression. */
  private def caseSql(h: String): String =
    hexThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $h < '$t' THEN $k" }
      .mkString("CASE ", " ", " ELSE 5 END")

  /** Shared Spark-SQL/DuckDB text for one replicate's weight draw. */
  private def weightSql(idExpr: String, b: Int): String =
    caseSql(sliceSql(groupHashSql(idExpr, b / 4), b))

  def meanCi(df: DataFrame, keyCol: String, idCol: String, xCol: String,
             b: Int = 64): DataFrame = {
    require(b >= 4 && b <= 256, s"meanCi: b=$b replicates must be in [4,256]")
    // hashes hoisted into their own projection: the threshold CASE
    // names its slice 5×, and inlining would evaluate md5 five times
    // per (row, replicate) unless codegen CSE catches it — don't
    // gamble. One GROUP hash serves four replicates (slice b%4).
    val groups = (b + 3) / 4
    val hashed = df.select(
      col(keyCol).as("key") +: col(xCol).cast("decimal(18,6)").as("_x") +:
        (0 until groups).map(g =>
          expr(groupHashSql(s"`$idCol`", g)).as(s"_g$g")): _*)
    // r19 (guide §1.2 step 2, per-task work): the B weighted sums fold
    // over LONG MICROS instead of decimal products. _xm is the exact
    // unscaled value of the SAME decimal(18,6) quantization (scale-6
    // multiply then narrowing cast — decimal(18,6)·10⁶ ≤ 10¹⁸ < 2⁶³,
    // never truncates), so Σ cᵢ·_xm == 10⁶ · Σ cᵢ·_x termwise and the
    // decimal the old fold produced is reconstructed EXACTLY at the
    // |keys| grain below. 2·B decimal aggregate buffers (BigDecimal
    // adds + overflow checks per row) become B long multiply-adds in
    // whole-stage codegen — measured 9.4s → ~4s at sf0.1 (B=64).
    val weighted = hashed.select(
      col("key") +: col("_x") +:
        (col("_x") * lit(1000000)).cast("long").as("_xm") +:
        (0 until b).map(i =>
          expr(caseSql(sliceSql(s"_g${i / 4}", i))).as(s"_c$i")): _*)
    // the point stats fold in the SAME aggregate as the replicates —
    // the corpus scans ONCE; everything after is the |keys|(·B) frame.
    // _sax (one decimal fold of Σ|x|) is the LOUD overflow guard for
    // the long folds: |Σ cᵢ·_xm| ≤ 5·10⁶·Σ|x| for every replicate, so
    // max(_sax) < 2⁶³/(5·10⁶) proves no long sum wrapped — checked
    // below with raise_error, never silently (the repo's bound-the-
    // quotient discipline: the GUARD scales, the fold stays primitive)
    val aggs = (0 until b).flatMap(i => Seq(
      sum(col(s"_c$i") * col("_xm")).as(s"_wxm$i"),
      sum(col(s"_c$i")).cast("long").as(s"_n$i"))) ++ Seq(
      sum(col("_x")).as("_sx"), sum(abs(col("_x"))).as("_sax"),
      count(lit(1)).as("_nr"))
    val reps = weighted.groupBy(col("key")).agg(aggs.head, aggs.tail: _*)
    // exact reconstruction of the old decimal mean at |keys|·B grain:
    // CAST(_wxm AS DECIMAL(26,6)) holds any long exactly; /10⁶ is an
    // exact scale shift (≤6 fractional digits), and its DOUBLE cast is
    // the same correctly-rounded value the decimal fold's cast gave
    val means = reps.select(col("key"), col("_sx"), col("_sax"),
      col("_nr"), expr(
        s"stack($b, " + (0 until b)
          .map(i => s"CAST(CAST(_wxm$i AS DECIMAL(26,6)) / 1000000 AS DOUBLE)" +
            s" / CAST(_n$i AS DOUBLE)")
          .mkString(", ") + ") as (_mb)"))
    val guarded = means.groupBy(col("key"))
      .agg(max(col("_nr")).as("n"),
        max(col("_sax")).as("_gsax"),
        round(max(col("_sx")).cast("double")
          / max(col("_nr")).cast("double"), 6).as("mean_x"),
        round(expr("percentile(_mb, 0.025)"), 6).as("ci_lo"),
        round(expr("percentile(_mb, 0.975)"), 6).as("ci_hi"))
    guarded
      .withColumn("_ok", col("_gsax") < lit(1.8e12).cast("decimal(28,6)"))
      .select(col("key"), col("n"), col("mean_x"),
        when(col("_ok"), col("ci_lo")).otherwise(raise_error(concat(
          lit("meanCi: Σ|x| exceeds the long-micros fold bound for key "),
          col("key").cast("string")))).as("ci_lo"),
        when(col("_ok"), col("ci_hi")).otherwise(raise_error(concat(
          lit("meanCi: Σ|x| exceeds the long-micros fold bound for key "),
          col("key").cast("string")))).as("ci_hi"))
  }

  /** The DuckDB oracle, generated from the SAME weight/threshold text
    * so the two engines cannot drift. */
  def oracleSql(table: String, keyCol: String, idCol: String, xCol: String,
                b: Int = 64): String = {
    val wCols = (0 until b)
      .map(i => s"${weightSql(idCol, i)} AS c$i").mkString(",\n                ")
    val aggCols = (0 until b).map(i =>
      s"sum(c$i * CAST($xCol AS DECIMAL(18,6))) AS wx$i, " +
        s"CAST(sum(c$i) AS BIGINT) AS n$i").mkString(",\n                ")
    val meanRows = (0 until b).map(i =>
      s"SELECT $keyCol AS key, CAST(wx$i AS DOUBLE) / CAST(n$i AS DOUBLE) AS mb FROM r")
      .mkString("\n              UNION ALL ")
    s"""WITH w AS (SELECT $keyCol, $xCol,
                $wCols
              FROM $table),
            r AS (SELECT $keyCol,
                $aggCols
              FROM w GROUP BY 1),
            m AS ($meanRows),
            ci AS (SELECT key, round(quantile_cont(mb, 0.025), 6) AS ci_lo,
                          round(quantile_cont(mb, 0.975), 6) AS ci_hi
                   FROM m GROUP BY 1),
            p AS (SELECT $keyCol AS key, CAST(count(*) AS BIGINT) AS n,
                         round(CAST(sum(CAST($xCol AS DECIMAL(18,6))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE), 6) AS mean_x
                  FROM $table GROUP BY 1)
         SELECT p.key AS $keyCol, p.n, p.mean_x, ci.ci_lo, ci.ci_hi
         FROM p JOIN ci USING (key) ORDER BY 1"""
  }
}
