package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup

/** Incremental curation over an unbounded document stream: the
  * streaming halves of the batch CurateApp pipeline, composed.
  *
  *  - annotate: language ID + quality + redaction (narrow, codegen —
  *    identical expressions to the batch path, so batch and streaming
  *    curation agree row-for-row)
  *  - gate: drop low-quality docs before any state is spent on them
  *  - exact dedup: watermark-bounded hash state
  *    ([[graft.operators.Dedup.streamingExact]])
  *  - near-dup candidates: band-bucket state
  *    ([[graft.operators.Dedup.streamingNearDupCandidates]]) as a
  *    SEPARATE stream — append mode cannot retract an already-emitted
  *    document, so near-dups are surfaced for downstream resolution
  *    (connected components over the accumulated pairs) rather than
  *    dropped in-flight.
  *
  * Returns (curated, nearDupCandidates); the caller starts each with
  * its own sink/checkpoint. State at scale: one 8-byte hash per doc
  * within the watermark for dedup, one (owner, ts) per LSH bucket for
  * candidates — no document text is ever held in state.
  */
object CurateStream {

  def apply(docs: DataFrame, idCol: String, tsCol: String, textCol: String,
            delay: String, minQuality: Double = 0.3,
            maxTopTokFrac: Double = 0.5,
            shingleN: Int = 3, numHashes: Int = 16,
            bands: Int = 4): (DataFrame, DataFrame) = {
    val gated = docs
      .withColumn("lang_pred", TextFunctions.langId(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("top_tok_frac", TextFunctions.topTokenFraction(col(textCol)))
      .filter(col("quality") >= minQuality && col("top_tok_frac") <= maxTopTokFrac)
      .withColumn(textCol, TextFunctions.redact(col(textCol)))
    val curated = Dedup.streamingExact(gated, tsCol, textCol, delay)
    val candidates = Dedup.streamingNearDupCandidates(
      gated, idCol, textCol, tsCol, delay, shingleN, numHashes, bands)
    (curated, candidates)
  }

  /** Streaming SemDeDup gate: drop any document whose embedding sits
    * within `threshold` cosine of its nearest FIXED centroid —
    * "semantically identical to a known prototype" (the boilerplate /
    * already-ingested-content ball around each centroid). Surviving
    * rows carry (cluster, centroid_cos) for downstream routing.
    *
    * Reuses batch s09's literal-assignment expression
    * ([[graft.operators.Similarity.assignNearestCentroid]]): one
    * narrow codegen pass, NO shuffle, NO state — micro-batch
    * boundaries cannot change a decision, so streaming and batch
    * agree row-for-row against the same centroid set. (Cross-document
    * dedup among the survivors remains batch [[graft.operators.Similarity.semDedup]]'s
    * job — append mode cannot retract an emitted doc; this gate is
    * the stateless prototype-ball filter in front of it.)
    */
  def semGate(docs: DataFrame, embCol: String,
              cents: DataFrame, centIdCol: String, centVecCol: String,
              threshold: Double): DataFrame =
    graft.operators.Similarity
      .assignNearestCentroid(docs, embCol, cents, centIdCol, centVecCol)
      // null/missing embedding = no similarity evidence = KEEP, the
      // same dirty-input rule as the batch gates (LM floor, dup
      // ceiling); a bare `< threshold` would evaluate to null and
      // silently drop the row
      .filter(coalesce(col("centroid_cos") < threshold, lit(true)))

  /** Streaming Gopher gate: keep only documents passing the Rae et
    * al. 2021 A1 rule bundle, live. The verdict is ONE boolean
    * expression ([[graft.operators.TextStats.gopherPass]] — the same
    * tree the batch report's `pass` column evaluates), so the gate is
    * a stateless, shuffle-free filter on the micro-batch and batch /
    * streaming decisions are identical by construction (spec-pinned).
    */
  def gopherGate(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(graft.operators.TextStats.gopherPass(col(textCol)))

  /** Streaming C4 line-cleaning gate: scrub each arriving document
    * with the Raffel et al. 2020 line rules and drop pages failing
    * the page rules, live — the SAME
    * [[graft.operators.TextStats.c4KeepLine]]/
    * [[graft.operators.TextStats.c4PageOk]] expression trees as the
    * batch t27 operator, so stream and batch keep identical lines by
    * construction. Stateless, row-local, no shuffle: the gate
    * rewrites `textCol` to the kept lines in place and keeps every
    * other column (the batch operator reshapes instead; parity is on
    * the kept-line content, spec-pinned).
    */
  def c4Gate(docs: DataFrame, textCol: String,
             minKeptLines: Int = 3): DataFrame = {
    import graft.operators.TextStats
    // the kept-lines tree is referenced twice as a bare EXPRESSION
    // (filter + rewrite) rather than staged in a temp column — a
    // user's stream may already carry any column name, and a helper
    // column would silently clobber it
    val kept = filter(TextStats.c4Lines(col(textCol)),
      TextStats.c4KeepLine _)
    docs
      .filter(TextStats.c4PageOk(col(textCol)) &&
        size(kept) >= minKeptLines)
      .withColumn(textCol, array_join(kept, "\n"))
  }

  /** Streaming Gopher A2 gate: drop repetitive documents live, with
    * the SAME rounded fractions and thresholds as the batch
    * [[graft.operators.TextStats.gopherRepetition]] report
    * ([[graft.operators.TextStats.repetitionPass]] is one shared
    * boolean expression tree — row-local gram counting via the
    * compiled repetition_stats pass, no state, no shuffle).
    */
  def repetitionGate(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(graft.operators.TextStats.repetitionPass(col(textCol)))

  /** Live token-frequency sketch: the batch t20 Count-Min aggregate
    * ([[graft.functions.CountMinAgg]]) run AS STREAMING STATE — the
    * d×w counter grid is the aggregation buffer, so the state store
    * holds one 32 KB grid total (not per-token counts), micro-batches
    * merge by element-wise add, and the sketch after any prefix of
    * the stream is bit-identical to the batch sketch over the same
    * rows (spec-pinned). Run with complete/update output mode; probe
    * the emitted grid with [[graft.functions.CountMinAgg.estimate]].
    */
  def tokenSketch(docs: DataFrame, textCol: String,
                  width: Int = 1024, depth: Int = 4): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("_tok"))
      .filter(length(col("_tok")) > 0)
      .agg(graft.functions.CountMinAgg.sketch(col("_tok"), width, depth).as("sketch"))

  /** Live per-key distinct-count sketch: the d22/q30 KMV aggregate
    * ([[graft.functions.KmvAgg]]) run AS STREAMING STATE — the state
    * store holds one <= k-string sorted set per key (bounded at any
    * stream size; "distinct users per source, live" never needs the
    * distinct set itself), micro-batches merge by union-then-trim,
    * and the sketch after any prefix of the stream is bit-identical
    * to the batch sketch over the same rows (spec-pinned — the KMV
    * result is a set property, independent of arrival order). Run
    * with complete/update output mode; probe the emitted sketch with
    * [[graft.functions.KmvAgg.distinctEst]] for the live estimate.
    */
  def distinctSketch(df: DataFrame, keyCol: String, valueCol: String,
                     k: Int = 256): DataFrame =
    df.groupBy(col(keyCol))
      .agg(graft.functions.KmvAgg.sketch(
        md5(col(valueCol).cast("string")), k).as("sketch"))
}
