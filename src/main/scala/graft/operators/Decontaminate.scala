package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents sharing at least
  * `minOverlap` distinct word n-grams with any document of a benchmark
  * set — the standard eval-contamination sweep run before training.
  *
  * Shape at scale: both sides reduce to distinct (id, shingle) pairs;
  * the join shuffles on the shingle hash, so cost is driven by shared
  * vocabulary, never |train| x |bench|. The benchmark side is tiny in
  * practice, so its shingle table broadcasts and the sweep is one
  * narrow pass over the training corpus's shingles.
  */
object Decontaminate {

  /** Per contaminated training doc: how many benchmark docs it
    * overlaps (`n_bench_hits`) and the largest shared-shingle count
    * (`max_overlap`). Clean docs are absent from the output.
    */
  def flag(train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
           shingleN: Int = 3, minOverlap: Int = 5): DataFrame = {
    val ts = Dedup.shingles(train, idCol, textCol, shingleN)
    val bs = Dedup.shingles(bench, idCol, textCol, shingleN)
      .withColumnRenamed("id", "bench_id")
    ts.join(bs, "shingle")
      .groupBy(col("id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bench_hits"), max(col("overlap")).as("max_overlap"))
  }

  /** Bloom-only sweep ([[flag]]'s 100 TB-prefilter shape): fold the
    * benchmark shingle set into ONE portable m-bit Bloom bitmap
    * ([[graft.functions.BloomAgg]], 128 KB at m = 2^20), broadcast
    * it, and count per training doc the distinct shingles the filter
    * claims are benchmark shingles. No join on the shingle key at
    * all — the corpus side is one narrow codegen pass — at the price
    * of a bounded false-positive rate (~(kn/m)^k overcount; never an
    * undercount, so no contaminated doc escapes). The portable md5
    * bit positions make even the false positives reproducible by the
    * oracle, so d19 hash-checks this sweep end to end.
    *
    * Per flagged training doc: `bloom_hits` = distinct shingles the
    * filter reports present (>= `minHits`). Docs below the threshold
    * are absent, mirroring [[flag]].
    */
  def bloomFlag(train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
                shingleN: Int = 3, minHits: Int = 5,
                bits: Int = 1 << 20, hashes: Int = 3): DataFrame = {
    import graft.functions.BloomAgg
    val bloom = Dedup.shingles(bench, idCol, textCol, shingleN)
      .agg(BloomAgg.build(col("shingle"), bits, hashes).as("_bloom"))
    Dedup.shingles(train, idCol, textCol, shingleN)
      .crossJoin(broadcast(bloom))
      .filter(BloomAgg.mightContain(col("_bloom"), col("shingle"), bits, hashes))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("bloom_hits"))
      .filter(col("bloom_hits") >= minHits)
  }

  /** SEMANTIC decontamination: flag corpus items whose embedding lands
    * within cosine `threshold` of ANY benchmark/eval embedding — the
    * paraphrase-contamination sweep n-gram overlap ([[flag]]) misses
    * by construction (a reworded eval question shares no shingles but
    * stays semantically close; cf. the rephrased-sample contamination
    * studies, e.g. Yang et al. 2023).
    *
    * Shape at scale: eval sets are small by nature, so the eval
    * embeddings ride as LITERALS in one narrow codegen pass over the
    * corpus ([[Similarity.assignNearestCentroid]]'s device) — ZERO
    * shuffles, no join; the corpus scan reads only (id, vector). The
    * ≤128-vector literal bound is the same janino contract as s09's
    * gate; larger eval sets go through chunked calls (the union of
    * per-chunk flags is exact because max-cos ≥ τ ⟺ any chunk's
    * max-cos ≥ τ). Rows with null embeddings carry no similarity
    * evidence and are kept out of the report rather than guessed at.
    *
    * Output per flagged corpus row: (id, eval_id of the nearest eval
    * item by rounded-6dp cosine — ties to the lowest eval id — and
    * that cosine).
    */
  def semanticFlag(corpus: DataFrame, idCol: String, vecCol: String,
                   evalSet: DataFrame, evalIdCol: String, evalVecCol: String,
                   threshold: Double): DataFrame =
    Similarity.assignNearestCentroid(corpus, vecCol,
        evalSet, evalIdCol, evalVecCol, clusterCol = "eval_id", cosCol = "cos")
      .filter(col("cos") >= threshold)
      .select(col(idCol).as("id"), col("eval_id"), col("cos"))
}
