package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Blocklist, Decontaminate, Dedup, TextStats, Training}

/** End-to-end corpus curation: the operators composed the way a
  * training-data pipeline actually chains them. One pass over a
  * documents table:
  *
  *  0. boilerplate line removal (lines in >= minDocs docs stripped,
  *     docs reassembled; all-boilerplate docs drop out), then
  *     paragraph-level exact dedup (each distinct paragraph survives
  *     once corpus-wide, RefinedWeb-style)
  *  1. language ID + quality + repetition metrics (narrow, codegen)
  *  2. quality gate (drop low-quality / boilerplate docs) + a
  *     unigram-LM floor (mean token log-prob under the corpus's own
  *     distribution — the KenLM-perplexity stand-in) + a
  *     duplicated-substring ceiling (Lee et al. spans as a fraction)
  *  3. blocklist scrub (bloom prune + exact verify)
  *  4. exact dedup (keep lowest id per identical text)
  *  5. MinHash near-dup -> connected components -> keep BEST quality
  *  6. benchmark decontamination (drop docs overlapping the eval set)
  *  7. deterministic stratified sample per source, then a per-source
  *     quota cap (no domain dominates the output)
  *  8. write the curated corpus, hive-partitioned by language
  *
  * Usage: runMain graft.CurateApp <docsDir> <outDir> [benchModulo]
  * Prints one JSON line with stage survivor counts. Counting each
  * stage adds an action per stage (observability you'd keep in a real
  * pipeline run); set GRAFT_CURATE_COUNTS=0 to skip them and measure
  * the pure single-pass cost of the composed job.
  */
object CurateApp {
  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft_curated")
    val benchMod = args.lift(2).map(_.toInt).getOrElse(97)
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val doCounts = sys.env.getOrElse("GRAFT_CURATE_COUNTS", "1") != "0"
    val t0 = System.nanoTime()
    val counts = run(spark, docsDir, outDir, benchMod, doCounts)
    val dt = (System.nanoTime() - t0) / 1e9
    val cjson = Seq("input", "boilerplate", "para_dedup", "quality_gate",
        "blocklist", "exact_dedup", "near_dup", "decontaminated", "sampled",
        "quota")
      .map(k => s""""$k":${counts(k)}""").mkString("{", ",", "}")
    println(s"""{"stage_counts":$cjson,""" +
      f""""seconds":$dt%.1f,"out":"$outDir"}""")
    spark.stop()
  }

  /** The composed pipeline, callable from Bench and the specs. Returns
    * the per-stage survivor counts (all -1 when `doCounts` is off — the
    * pure single-pass cost of the composed job, the bench mode).
    */
  def run(spark: org.apache.spark.sql.SparkSession, docsDir: String,
          outDir: String, benchMod: Int = 97,
          doCounts: Boolean = true): Map[String, Long] = {
    def cnt(df: org.apache.spark.sql.DataFrame): Long = if (doCounts) df.count() else -1L

    val raw = GraftSession.table(spark, docsDir, "documents")
    val n0 = cnt(raw)

    // 0: strip lines that repeat across >= 100 docs (nav menus,
    // cookie banners); the frequent-line set broadcasts, the corpus
    // side stays an anti-join + reassembly
    val lineStripped = TextStats.stripRepeatedLines(raw, "doc_id", "text", minDocs = 100L)
      .select(col("id").as("doc_id"), col("text_clean").as("text"))
      .join(raw.drop("text"), "doc_id")
    val n0b = cnt(lineStripped)

    // 0b: paragraph-level exact dedup (RefinedWeb/CCNet step): each
    // distinct paragraph survives once corpus-wide, in its
    // (id, pos)-first doc; docs whose every paragraph appeared
    // earlier drop out here
    val docs = Dedup.paraDedup(lineStripped, "doc_id", "text")
      .select(col("id").as("doc_id"), col("text_clean").as("text"))
      .join(raw.drop("text"), "doc_id")
    val n0c = cnt(docs)

    // 1-2: annotate + gate + PII redaction (single narrow pass; all
    // expression trees — identical to CurateStream, so batch and
    // incremental curation agree row-for-row; the repetition gate uses
    // the row-local topTokenFraction expression, not the exploded
    // TextStats aggregate, so no extra shuffle)
    val scored = docs
      .withColumn("lang_pred", TextFunctions.langId(col("text")))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("top_tok_frac", TextFunctions.topTokenFraction(col("text")))
      .withColumn("text", TextFunctions.redact(col("text")))
    // unigram-LM floor: mean token log-prob under the corpus's own
    // distribution; a loose bound (-12 nats) drops only rare-token
    // gibberish, not ordinary text
    val lmScore = TextStats.unigramLogProb(scored, "doc_id", "text")
      .select(col("id").as("doc_id"), col("mean_logprob"))
    // LEFT join: a doc that tokenizes to nothing (every surviving line
    // blank after boilerplate strip + redaction) has no LM evidence —
    // it is the quality gate's call, not an implicit inner-join drop
    // duplicated-substring ceiling (Lee et al. 2021): a doc mostly
    // made of corpus-repeated k-grams is boilerplate/spam the line-
    // and paragraph-level passes missed (LEFT join, same reasoning as
    // the LM floor: no grams = no dup evidence = keep)
    val dupFrac = Dedup.dupSubstringSpans(scored, "doc_id", "text", k = 8)
      .select(col("id").as("doc_id"), col("dup_frac"))
    val gated = scored
      .filter(col("quality") >= 0.3 && col("top_tok_frac") <= 0.5)
      .join(lmScore, Seq("doc_id"), "left")
      .filter(coalesce(col("mean_logprob"), lit(0.0)) >= -12.0)
      .drop("mean_logprob")
      .join(dupFrac, Seq("doc_id"), "left")
      .filter(coalesce(col("dup_frac"), lit(0.0)) <= 0.6)
      .drop("dup_frac")
    val n1 = cnt(gated)

    // 3: scrub a blocklist (here: a synthetic takedown list, taken from
    // the same redacted text the match runs against)
    val blocked = scored.filter(col("doc_id") % 331 === 0)
      .select(col("text").as("blocked_text"))
    // gated feeds both bloom branches of the scrub and the dedup below.
    // It recomputes per consumer ON PURPOSE: each consumer prunes to the
    // few columns it reads, and re-running the pruned codegen prefix
    // measures ~1.7x FASTER end-to-end than caching the wide frame
    // (39s vs 68s at sf0.1), which would materialize every column.
    val scrubbed = Blocklist.filterOut(gated, blocked, "text", "blocked_text")
    val n2 = cnt(scrubbed)

    // 4: exact dedup — keep the lowest id of identical texts.
    // exactKept DOES persist: its three consumers (signature build,
    // component resolution, keeper join) all need the same narrow
    // columns, so here the cache wins.
    val keepIds = Dedup.exact(scrubbed, "doc_id", "text").select("keep_id")
    val exactKept = scrubbed.join(keepIds,
      scrubbed("doc_id") === keepIds("keep_id")).drop("keep_id").persist()
    val n3 = cnt(exactKept)

    // 5: near-dup clusters -> keep the highest-quality member
    val pairs = Dedup.minHashLsh(exactKept, "doc_id", "text",
      shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
    val resolved = Dedup.resolveKeepBest(exactKept, "doc_id", "quality", pairs)
      .persist()
    val n4 = cnt(resolved)

    // 6: decontaminate against the held-out eval slice — drawn from the
    // same REDACTED text as the corpus side, so shingles straddling a
    // redacted span still match (same normalization both sides)
    val bench = scored.filter(col("doc_id") % benchMod === 0)
    val contaminated = Decontaminate.flag(
      resolved, bench, "doc_id", "text", shingleN = 3, minOverlap = 5)
      .select(col("id").as("bad_id"))
    val cleanDocs = resolved.join(contaminated,
      resolved("doc_id") === contaminated("bad_id"), "left_anti")
    val n5 = cnt(cleanDocs)

    // 7: stratified sample (reproducible md5 buckets; src0 kept denser),
    // then an absolute per-source cap so no domain dominates
    val sampled = cleanDocs.filter(
      substring(md5(col("doc_id").cast("string")), 1, 2) <
        when(col("source") === "src0", "80").otherwise("40"))
    val n6 = cnt(sampled)
    val capped = Training.sourceQuota(sampled, "source", "doc_id",
      maxPerSource = 2000L)
    val n7 = cnt(capped)

    // 8: curated corpus, partitioned for downstream partition pruning
    capped.select("doc_id", "text", "lang_pred", "source", "quality")
      .write.mode("overwrite").partitionBy("lang_pred").parquet(outDir)

    exactKept.unpersist()
    resolved.unpersist()
    Map("input" -> n0, "boilerplate" -> n0b, "para_dedup" -> n0c,
      "quality_gate" -> n1, "blocklist" -> n2, "exact_dedup" -> n3,
      "near_dup" -> n4, "decontaminated" -> n5, "sampled" -> n6,
      "quota" -> n7)
  }
}
