package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data assembly: the last mile of an LLM curation pipeline,
  * after dedup/filter/decontaminate — pack documents into fixed-length
  * training sequences, sample sources to a target mixture, and assign
  * docs to shards in a deterministic pseudo-random order.
  *
  * All three are deterministic (md5-keyed, not rand()) so runs are
  * reproducible and every op is oracle-checkable bit-for-bit.
  */
object Training {

  /** Concat-and-chunk sequence packing: documents are laid out in
    * `orderCol` order as one virtual token stream, which is cut into
    * sequences of exactly `seqLen` tokens (GPT-style packing; a doc
    * may span a sequence boundary). Returns, per document, the
    * half-open span it occupies: first/last sequence index and the
    * offset of its first token within the first sequence.
    *
    * Shape at scale: the global running total is a distributed prefix
    * sum — per-range-partition local cumsum, then a prefix over the
    * per-partition totals (one row per partition, so the single-task
    * window on it is O(partitions), not O(rows)) broadcast-joined
    * back. Both shuffles move only (id, n_toks) pairs — 16 bytes a
    * row — never document text, so the op is two narrow passes at any
    * corpus size. No global single-partition window anywhere.
    */
  /** LENGTH-BUCKETED batch assembly — the pad-efficiency dynamic
    * batching every trainer's data loader ships (batch same-length
    * docs together so padding-to-cap wastes little): each doc lands
    * in the smallest cap of `caps` holding its token count (the top
    * cap catches — and truncates to cap semantics — everything
    * longer), docs order within their bucket by md5 (the p19
    * reproducible-shuffle rule), and consecutive runs of `batchSize`
    * form batches. Reports the per-doc padding cost so the efficiency
    * win over single-cap batching is auditable.
    *
    * Shape at scale: the per-bucket rank is the packSequences
    * DISTRIBUTED prefix count — range-partition on (cap, md5, id),
    * per-partition row_number, plus a #partitions×#caps offset frame;
    * NO per-bucket global window (buckets are few and corpus-sized —
    * a Window.partitionBy(cap) would put the whole corpus in ≤|caps|
    * partitions).
    * Output: (id, n_toks, bucket_cap, rank_in_bucket, batch_idx,
    * pad_tokens).
    */
  def lengthBatches(df: DataFrame, idCol: String, nTokCol: String,
                    caps: Seq[Long], batchSize: Int): DataFrame = {
    require(caps.nonEmpty && caps == caps.sorted && caps.distinct == caps &&
      caps.forall(_ >= 1), s"lengthBatches: caps $caps must be distinct, " +
      "ascending and positive")
    require(batchSize >= 1, s"lengthBatches: batchSize $batchSize must be >= 1")
    val capCase = caps.init.foldRight(lit(caps.last): Column) { (c, acc) =>
      when(col("_n") <= c, lit(c)).otherwise(acc)
    }
    val base = df.select(col(idCol).as("id"),
        col(nTokCol).cast("long").as("_n"))
      .withColumn("_cap", capCase)
      .withColumn("_h", md5(concat(lit("b:"), col("id").cast("string"))))
    // sealed for the same reason as packSequences: the ranged frame
    // feeds both the local ranks and the offset totals, and a
    // twice-evaluated repartitionByRange can sample different bounds
    val ranged = Caching.sealOver(
      base.repartitionByRange(col("_cap"), col("_h"), col("id"))
        .withColumn("_pid", spark_partition_id()))
    val local = ranged.withColumn("_lrank",
      row_number().over(Window.partitionBy("_pid", "_cap")
        .orderBy(col("_h"), col("id"))))
    val offs = ranged.groupBy(col("_pid"), col("_cap"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(Window.partitionBy("_cap").orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_cap"), col("_off"))
    local.join(offs, Seq("_pid", "_cap"))
      .withColumn("rank_in_bucket", col("_lrank") + col("_off"))
      .withColumn("batch_idx",
        expr(s"(rank_in_bucket - 1) div $batchSize"))
      .withColumn("pad_tokens", col("_cap") - least(col("_n"), col("_cap")))
      .select(col("id"), col("_n").as("n_toks"), col("_cap").as("bucket_cap"),
        col("rank_in_bucket"), col("batch_idx"), col("pad_tokens"))
  }

  def packSequences(df: DataFrame, orderCol: String, nTokCol: String,
                    seqLen: Long): DataFrame = {
    // SEALED AT THE INPUT, not the output: the per-partition totals
    // AND the final join both read this frame, and a
    // repartitionByRange evaluated twice can SAMPLE DIFFERENT
    // BOUNDARIES (RangePartitioner's reservoir seed varies per
    // execution) — _pid would then disagree between _lcum and _poff
    // and silently corrupt the prefix sum. Sealing the narrow
    // (orderCol, nTok, _pid) frame pins ONE evaluation while the
    // corpus-sized RESULT stays lazy (sealing that would violate
    // sealOver's small-result contract). tokenBudget avoids the
    // hazard outright with value-derived hash buckets, but an
    // ARBITRARY orderCol has no deterministic range bucketing
    // without sampling.
    // RETENTION NOTE: the sealed blocks (3 narrow columns × corpus
    // rows) stay pinned until this result frame is garbage-collected
    // and ContextCleaner runs — there is no safe earlier unpersist
    // point, because the lazy result reads the sealed frame twice
    // (cumsum + totals). One-shot jobs don't care; a long-lived
    // session packing many corpora should drop its reference to the
    // result when done (Bench-style `getPersistentRDDs` hygiene also
    // works). Sized: ~24 bytes/row, NOT the documents.
    val ranged = Caching.sealOver(
      df.select(col(orderCol), col(nTokCol))
        .repartitionByRange(col(orderCol))
        .withColumn("_pid", spark_partition_id()))
    val cumWin = Window.partitionBy("_pid").orderBy(orderCol)
    // duplicate order keys would make the layout ambiguous (the
    // cumsum window's RANGE frame sums PEERS together: two docs
    // sharing a key would claim overlapping spans). Enforced INSIDE
    // the cumsum pass rather than as its own eager aggregation:
    // equal keys are adjacent in the window sort and range
    // partitioning keeps them in one partition, so a null-safe lag
    // compare sees every duplicate. Folded into _lcum arithmetic
    // (+0 on the clean path) so column pruning can't drop the check;
    // fails at first action, not at call time.
    val dupGuard = coalesce(
      when(lag(col(orderCol), 1).over(cumWin) <=> col(orderCol),
        raise_error(concat(
          lit(s"packSequences: duplicate $orderCol value "),
          col(orderCol).cast("string"),
          lit(" — order keys must be unique or the packed layout is ambiguous")))
          .cast("long")),
      lit(0L))
    val local = ranged.withColumn("_lcum",
      sum(col(nTokCol)).over(cumWin) + dupGuard)
    // one row per partition; the un-partitioned window here scans
    // #partitions rows, not the corpus
    val prefix = ranged.groupBy("_pid").agg(sum(col(nTokCol)).as("_ptot"))
      .withColumn("_poff", coalesce(
        sum(col("_ptot")).over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_ptot")
    local.join(broadcast(prefix), "_pid")
      .withColumn("_cb", col("_poff") + col("_lcum") - col(nTokCol))
      .filter(col(nTokCol) > 0)
      .select(col(orderCol), col(nTokCol),
        expr(s"_cb div $seqLen").as("seq_start"),
        expr(s"(_cb + $nTokCol - 1) div $seqLen").as("seq_end"),
        (col("_cb") % seqLen).as("seq_off"))
  }

  /** Deterministic mixture sampling: downsample each source so the
    * kept corpus approaches `targetFrac` of the input with per-source
    * shares given by `weightExpr` (a Column of the desired mixture
    * weight for the row's source, summing to 1 across sources).
    * Per-source keep rate = min(1, w_s * targetFrac * N / n_s),
    * applied as an md5-threshold filter — reproducible across runs
    * and engines, unlike rand()-based sampling.
    *
    * Shape at scale: one count aggregate (bytes per source), rate
    * math on that tiny frame, broadcast back, then a narrow filter.
    * The corpus is scanned twice but shuffled never.
    *
    * `weightExpr` must be a pure function of `sourceCol` (one weight
    * per source). That contract is ENFORCED: the aggregate takes
    * min and max of the weight per source and fails the job if they
    * differ, rather than silently picking an arbitrary row's value
    * (`first()` would) and breaking reproducibility.
    */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
                    weightExpr: Column, targetFrac: Double): DataFrame = {
    // count(weightExpr) < count(*) catches NULL weights (min/max skip
    // nulls, so an all-NULL weight would otherwise hit the constancy
    // branch as NULL === NULL and die with a misleading message)
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("_n"),
        min(weightExpr).as("_w"), max(weightExpr).as("_wmax"),
        count(weightExpr).as("_wn"))
      .withColumn("_w",
        when(col("_wn") < col("_n"), raise_error(concat(
            lit("mixtureSample: weightExpr is NULL for source "),
            col(sourceCol).cast("string"))))
          .when(col("_w") === col("_wmax"), col("_w"))
          .otherwise(raise_error(concat(
            lit("mixtureSample: weightExpr is not constant within source "),
            col(sourceCol).cast("string")))))
      .drop("_wmax", "_wn")
    val total = counts.agg(sum(col("_n")).as("_total"))
    // 1048576 = 16^5: the keep threshold as a 5-hex-digit md5 prefix
    // bound — floor'd once here so both engines compare identical
    // strings; rate 1.0 caps at 'fffff' (keeps all but 1/2^20)
    val thr = counts.crossJoin(broadcast(total))
      .withColumn("_rate", least(
        col("_w") * (col("_total").cast("double") * targetFrac)
          / col("_n").cast("double"), lit(1.0)))
      .withColumn("_thr", format_string("%05x",
        least(floor(col("_rate") * 1048576.0), lit(1048575.0)).cast("long")))
      .select(col(sourceCol), col("_thr"))
    df.join(broadcast(thr), sourceCol)
      .filter(substring(md5(col(idCol).cast("string")), 1, 5) < col("_thr"))
      .drop("_thr")
  }

  /** MIXTURE QA REPORT (the audit that closes p02's loop: a mixture
    * you sampled but never measured is a mixture you don't have —
    * md5-threshold keep rates only approximate the target
    * binomially, and a small source upweighted 8× can miss by
    * percents): per source, input count, kept count, the TARGET
    * share, the ACHIEVED share of the kept corpus, and the relative
    * error. Sources sampled to zero keep a row (n_kept 0, error −1)
    * — silent absence is exactly what the audit exists to catch.
    *
    * Pure composition: [[mixtureSample]] unchanged underneath, one
    * source-grain aggregate each side of it, pinned divisions.
    */
  def mixtureReport(df: DataFrame, sourceCol: String, idCol: String,
                    weightExpr: Column, targetFrac: Double): DataFrame = {
    val kept = mixtureSample(df, sourceCol, idCol, weightExpr, targetFrac)
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_kept"))
    val inC = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_in"), min(weightExpr).as("_w"))
    val tot = kept.agg(sum(col("n_kept")).as("_tk"))
    val ach = col("n_kept").cast("double") / col("_tk").cast("double")
    inC.join(kept, Seq(sourceCol), "left")
      .na.fill(0L, Seq("n_kept"))
      .crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_in"), col("n_kept"),
        round(col("_w"), 6).as("target_share"),
        round(ach, 6).as("achieved_share"),
        round((ach - col("_w")) / col("_w"), 6).as("rel_error"))
      .orderBy(sourceCol)
  }

  /** Per-source quota: keep at most `maxPerSource` documents from each
    * source, chosen by deterministic md5 order (not arrival order, so
    * the kept subset is unbiased and reproducible). The crawl-curation
    * counterpart of mixture sampling when the target is an absolute
    * cap ("no domain contributes more than K docs"), the standard
    * guard against a single giant domain dominating the corpus.
    *
    * Shape at scale: two-phase salted top-K. Phase 1 ranks within
    * (source, salt) — `saltBuckets` deterministic hash buckets — and
    * keeps each bucket's local top-`maxPerSource`; a mega-domain's
    * rows spread over saltBuckets tasks instead of one hot window
    * partition. Phase 2 ranks the survivors (≤ saltBuckets × cap per
    * source — BOUNDED regardless of input skew) on the source key
    * alone. Any row in the global md5-top-cap of its source is also in
    * the top-cap of its own salt bucket, so the result is EXACTLY the
    * single-window answer — unconditionally, unlike an md5-threshold
    * prefilter (the mixtureSample trick), whose binomial survivor
    * count can undershoot the cap and which needs a verify-fallback
    * pass to stay exact.
    */
  def sourceQuota(df: DataFrame, sourceCol: String, idCol: String,
                  maxPerSource: Long, saltBuckets: Int = 64): DataFrame = {
    val h = md5(col(idCol).cast("string"))
    val salt = pmod(xxhash64(col(idCol)), lit(saltBuckets))
    df.withColumn("_qr1", row_number().over(
        Window.partitionBy(col(sourceCol), salt).orderBy(h, col(idCol))))
      .filter(col("_qr1") <= maxPerSource)
      .withColumn("_qr", row_number().over(
        Window.partitionBy(col(sourceCol)).orderBy(h, col(idCol))))
      .filter(col("_qr") <= maxPerSource)
      .drop("_qr1", "_qr")
  }

  /** Temperature-weighted mixture sampling (the multinomial
    * source-reweighting of GPT-3 / The Pile / mT5 §3.1): sample the
    * corpus down to `total * targetNum / targetDen` documents, with
    * each source's share proportional to n_s^alpha — alpha < 1
    * flattens the source distribution, boosting small sources
    * relative to giant crawls. Per-source targets are EXACT counts
    * (not mixtureSample's binomial keep-rates): source s keeps its
    * md5-first min(n_s, T * n_s^alpha / Σ n_t^alpha) documents.
    *
    * Determinism across engines: n^alpha is scaled to the integer
    * R_s = floor(n^0.5 * 1e6) — sqrt is IEEE-correctly-rounded in
    * both the JVM and DuckDB, so R_s is bit-identical — and every
    * downstream step (Σ R_s, T = total*num/den, k_s = T*R_s/S) is
    * arbitrary-precision integer floor arithmetic: BigInt here,
    * HUGEINT in the oracle. No floating sum whose addition order
    * could differ. alpha values other than 0.5 go through pow(),
    * whose libm rounding is NOT pinned across engines — supported,
    * but only alpha=0.5 carries the oracle-exact guarantee.
    *
    * Shape at scale: one count aggregate collapses the corpus to
    * #sources rows — collected to the driver ONLY at that size (the
    * trainCoarse/driver-quantizer rule) for the exact quota math —
    * then the quota map broadcasts back and selection is
    * [[sourceQuota]]'s two-phase salted top-K with a per-source cap:
    * bounded survivors regardless of skew, exactly the single-window
    * answer. Sampling-by-count is the paper formulation; weigh by
    * tokens instead by pre-aggregating nTok into the count if needed.
    */
  def temperatureSample(df: DataFrame, sourceCol: String, idCol: String,
                        targetNum: Long, targetDen: Long,
                        alpha: Double = 0.5, saltBuckets: Int = 64): DataFrame = {
    require(targetDen > 0 && targetNum >= 0 && targetNum <= targetDen,
      s"temperatureSample: target fraction $targetNum/$targetDen not in [0,1]")
    require(alpha > 0 && alpha <= 1, s"temperatureSample: alpha $alpha not in (0,1]")
    val spark = df.sparkSession
    val counts = df.groupBy(col(sourceCol).as("_src"))
      .agg(count(lit(1)).as("_n")).collect()
      .map(r => (r.get(0), r.getLong(1)))
    def rs(n: Long): BigInt = {
      val w = if (alpha == 0.5) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, alpha)
      BigInt(math.floor(w * 1e6).toLong)
    }
    val total = BigInt(counts.map(_._2).sum)
    val s = counts.map { case (_, n) => rs(n) }.sum
    val t = total * targetNum / targetDen
    val quotas = counts.map { case (src, n) =>
      val k = (t * rs(n) / s).min(BigInt(n))
      org.apache.spark.sql.Row(src, k.toLong)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_src",
        df.schema(sourceCol).dataType),
      org.apache.spark.sql.types.StructField("_cap",
        org.apache.spark.sql.types.LongType)))
    val capDf = spark.createDataFrame(
      spark.sparkContext.parallelize(quotas.toSeq, 1), schema)
    val h = md5(col(idCol).cast("string"))
    val salt = pmod(xxhash64(col(idCol)), lit(saltBuckets))
    df.join(broadcast(capDf), col(sourceCol) === col("_src"))
      .withColumn("_qr1", row_number().over(
        Window.partitionBy(col(sourceCol), salt).orderBy(h, col(idCol))))
      .filter(col("_qr1") <= col("_cap"))
      .withColumn("_qr", row_number().over(
        Window.partitionBy(col(sourceCol)).orderBy(h, col(idCol))))
      .filter(col("_qr") <= col("_cap"))
      .drop("_qr1", "_qr", "_src", "_cap")
  }

  /** Deterministic train/val/test split by md5 hash range: the first
    * 5 hex digits of md5(id) land in [0, val), [val, val+test), or
    * the rest — reproducible across runs and engines (no rand()),
    * stable under corpus growth (a doc's split never changes when
    * other docs arrive), and exactly the mixtureSample threshold
    * trick with named buckets. One narrow projection, zero shuffles.
    * Output: input columns + `split` ∈ {train, val, test}.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  valFrac: Double, testFrac: Double): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1,
      s"assignSplit: bad fractions val=$valFrac test=$testFrac")
    // clamp to 'fffff' like mixtureSample: fraction 1.0 would format
    // the 6-char '100000', which compares lexicographically BELOW
    // every hex prefix starting 2-f and silently misroutes to train
    def thr(frac: Double): String =
      f"${math.min(math.floor(frac * 1048576.0).toLong, 1048575L)}%05x"
    val valThr = thr(valFrac)
    val bothThr = thr(valFrac + testFrac)
    val h = substring(md5(col(idCol).cast("string")), 1, 5)
    df.withColumn("split",
      when(h < valThr, "val").when(h < bothThr, "test").otherwise("train"))
  }

  /** Stratified INTERLEAVED training order — the data-ordering step
    * after mixing: a plain reproducible shuffle (p03) still deals
    * long same-source runs by chance, and source-sorted ingestion
    * deals catastrophic ones; gradient quality prefers consecutive
    * batches that rotate across sources. Each doc gets its ROUND
    * (its rank within its source, md5-ordered — round r holds the
    * r-th doc of EVERY source that still has one) and a round-local
    * md5 tiebreak; training order = sort by (round, ord). With
    * equal-sized sources a source repeats adjacently only across a
    * round boundary (run length ≤ 2, spec-pinned); small sources
    * simply exhaust early.
    *
    * Shape at scale: ONE source-key shuffle for the rank window
    * (the p04/p08 shuffle), a row-local tiebreak, and NO global
    * window — the (round, ord) key IS the order; a consumer
    * range-partitions on it to materialize the schedule.
    * Output: input columns + round + ord.
    */
  def interleaveOrder(df: DataFrame, idCol: String,
                      sourceCol: String): DataFrame = {
    val h = md5(col(idCol).cast("string"))
    df.withColumn("round", row_number().over(
        Window.partitionBy(col(sourceCol)).orderBy(h, col(idCol))).cast("long"))
      .withColumn("ord", md5(concat(lit("o:"), col(idCol).cast("string"))))
  }

  /** LEAKAGE-SAFE train/val/test split — cluster-aware splitting, the
    * contamination complement of [[assignSplit]]: a random split of a
    * near-duplicated corpus puts one copy in train and its twin in
    * test, silently inflating eval (the Lee et al. 2021 dedup
    * motivation applied to SPLITTING). Here the hash range is drawn
    * for each near-dup COMPONENT, not each doc — every member
    * inherits its component representative's bucket, so a cluster can
    * never straddle a split boundary. Docs in no pair are their own
    * component, so on a fully-deduplicated corpus this degenerates to
    * [[assignSplit]] exactly (spec-pinned).
    *
    * Shape at scale: `pairs` is the d02/d11 LSH candidate output
    * (never all-pairs); components ride the d06 union-find /
    * large-star machinery; the split itself is one md5 projection on
    * the component key — no shuffle beyond what component resolution
    * already paid. Growth-stability inherits from the component key:
    * a component's split never changes unless new duplicates MERGE
    * components (at which point moving is the point — the merged
    * cluster must land on one side).
    *
    * Output: input columns + `component` + `split`.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       valFrac: Double, testFrac: Double): DataFrame =
    assignSplit(Dedup.components(df, idCol, pairs), "component",
      valFrac, testFrac)

  /** Token-budget cut: keep documents, in deterministic md5(id)
    * order, while the cumulative token count stays within `budget` —
    * "give me exactly ~N tokens of this corpus, reproducibly" (the
    * corpus-sizing step after mixture/quota shaping). Only WHOLE
    * documents are kept: the doc that would cross the budget is
    * dropped, as is everything after it in hash order.
    *
    * Shape at scale: a distributed prefix sum over VALUE-derived
    * buckets — the first 3 hex chars of md5(id) give 4096 balanced
    * (md5-uniform), hash-order-contiguous buckets, so the per-bucket
    * cumsum window plus a prefix over the 4096 bucket totals is the
    * exact global cumulative sum. Unlike [[packSequences]]'
    * repartitionByRange, the bucket of a row is a pure function of
    * its value: the bucketed frame can be evaluated once per consumer
    * with no sampled partition boundaries to disagree between the
    * cumsum side and the totals side. No persist, no global
    * corpus-keyed window.
    */
  def tokenBudget(df: DataFrame, idCol: String, nTokCol: String,
                  budget: Long): DataFrame = {
    // null ids have no hash position in the keep order — excluded UP
    // FRONT (the trainCoarse null-vector rule), so they neither
    // surface nor charge their tokens against the budget. Leaving
    // them in would do the worst of both: md5(null) buckets sort
    // first and offset every _poff, while the inner bucket join
    // silently drops the rows themselves.
    val b = df.filter(col(idCol).isNotNull)
      .withColumn("_h", md5(col(idCol).cast("string")))
      .withColumn("_b", substring(col("_h"), 1, 3))
    val local = b.withColumn("_lcum",
      sum(col(nTokCol)).over(
        Window.partitionBy("_b").orderBy(col("_h"), col(idCol))))
    // one row per bucket: the un-partitioned window scans <= 4096
    // rows, not the corpus
    val prefix = b.groupBy("_b").agg(sum(col(nTokCol)).as("_btot"))
      .withColumn("_poff", coalesce(
        sum(col("_btot")).over(Window.orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_btot")
    local.join(broadcast(prefix), "_b")
      .filter(col("_poff") + col("_lcum") <= budget)
      .drop("_h", "_b", "_lcum", "_poff")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more likely its hashed n-gram features are
    * under a TARGET distribution (docs matching `targetPred`, e.g. a
    * benchmark/seed domain) than under the RAW corpus distribution,
    * then keep the `topN` highest-weight documents. Features are
    * unigrams + adjacent bigrams hashed into `buckets`=4096 portable
    * md5 buckets (first 3 hex digits); bucket probabilities are
    * add-1-smoothed; the log importance weight of a doc is the sum of
    * its occurrences' per-bucket log ratios.
    *
    * Deterministic end to end: md5 bucketing (no seed), per-bucket
    * log ratios rounded to 6 then DECIMAL-summed per doc, top-N ties
    * broken by id — oracle-exact. (The paper resamples with Gumbel
    * noise; the deterministic top-N is the reproducible variant a
    * curation pipeline actually wants to re-run.)
    *
    * Shape at scale: the feature explode is narrow and feeds (a) one
    * 4096-row bucket-count aggregate — map-side partials collapse the
    * stream to `buckets` rows per task, and target + raw counts ride
    * ONE pass as a conditional count — and (b) the scoring join
    * against the broadcast 4096-row log-ratio table, followed by one
    * id-keyed sum. The bucketed stream is PERSISTED between the two
    * consumers as three narrow columns (id, tgt, bucket) — profiled
    * at 10× sf0.1: re-tokenizing + re-hashing the corpus for the
    * scoring pass cost 3.2s vs 2.1s persisted (flat at sf0.1, where
    * overhead dominates), so the round-9 "recompute is cheaper" note
    * was wrong once the corpus outgrows the fixed costs. On a cluster
    * the persisted stream spills MEMORY_AND_DISK — a sequential
    * local-disk round-trip against re-reading and re-md5'ing the full
    * corpus. The only corpus-sized shuffle remains the per-doc sum
    * keyed on id; top-N is a TakeOrdered, not a global sort. The
    * top-N result seals over the persisted stream (Caching.sealOver),
    * so no cache blocks outlive the call.
    *
    * Output: (id, n_feats, log_weight) for the selected top-N docs.
    * Docs with no tokens have no feature evidence and drop out.
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, buckets: Int = 4096,
                  topN: Int = 100): DataFrame = {
    require(buckets == 4096,
      "dsirWeights: bucket count is pinned to 4096 = 16^3 (3 md5 hex digits)")
    val toksArr = filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0)
    val base = df.select(col(idCol).as("id"), targetPred.as("_tgt"), toksArr.as("_t"))
    val uni = base.select(col("id"), col("_tgt"), explode(col("_t")).as("_f"))
    val bi = base.filter(size(col("_t")) >= 2)
      .select(col("id"), col("_tgt"),
        explode(graft.functions.ShingleStrings.of(col("_t"), 2)).as("_f"))
    val feats = uni.unionByName(bi)
      .withColumn("_b", conv(substring(md5(col("_f")), 1, 3), 16, 10).cast("long"))
      .select(col("id"), col("_tgt"), col("_b"))
      .persist()
    val counts = feats.groupBy(col("_b"))
      .agg(count(lit(1)).as("_cr"),
        count(when(col("_tgt"), lit(1))).as("_ct"))
    val tot = counts.agg(sum(col("_cr")).as("_nr"), sum(col("_ct")).as("_nt"))
    val lr = counts.crossJoin(broadcast(tot))
      .withColumn("_lr", round(log(
        ((col("_ct") + 1L).cast("double") / (col("_nt") + buckets).cast("double")) /
          ((col("_cr") + 1L).cast("double") / (col("_nr") + buckets).cast("double"))), 6)
        .cast("decimal(24,8)"))
      .select(col("_b"), col("_lr"))
    val res = feats.join(broadcast(lr), Seq("_b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_feats"),
        round(sum(col("_lr")).cast("double"), 6).as("log_weight"))
      .orderBy(col("log_weight").desc, col("id"))
      .limit(topN)
    graft.operators.Caching.sealOver(res, feats)
  }

  /** GPT-3-style quality classifier, trained and applied in-engine:
    * label a curated SEED slice (`posPred` — the role WebText plays
    * in Brown et al. 2020 §2.2) positive and the rest of the corpus
    * negative, fit naive-Bayes log-odds over the SAME hashed
    * unigram+bigram features as [[dsirWeights]] (4096 portable md5
    * buckets, add-1 smoothing), then score EVERY document:
    * score = prior log-odds + sum of its features' bucket log-odds;
    * `keep` = score > 0 (= P(seed|doc) > 0.5). The difference from
    * DSIR is the contrast: DSIR weighs target vs the WHOLE corpus
    * for resampling; the classifier weighs seed vs NON-seed and
    * emits a hard keep/drop verdict.
    *
    * Training is two tiny aggregates (4096 bucket rows + one prior
    * row); inference is the broadcast-join + id-keyed sum shape of
    * dsirWeights — no corpus-sized shuffle except the per-doc sum.
    * Deterministic end to end (md5 buckets, round-6 log-odds,
    * DECIMAL sums) — oracle-exact. Docs with no tokens have no
    * evidence and drop out.
    *
    * Output: (id, n_feats, score, keep) for every doc with features.
    */
  def qualityClassifier(df: DataFrame, idCol: String, textCol: String,
                        posPred: Column, buckets: Int = 4096): DataFrame = {
    require(buckets == 4096,
      "qualityClassifier: bucket count is pinned to 4096 = 16^3 (3 md5 hex digits)")
    val toksArr = filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0)
    val base = df.select(col(idCol).as("id"), posPred.as("_pos"), toksArr.as("_t"))
    val uni = base.select(col("id"), col("_pos"), explode(col("_t")).as("_f"))
    val bi = base.filter(size(col("_t")) >= 2)
      .select(col("id"), col("_pos"),
        explode(graft.functions.ShingleStrings.of(col("_t"), 2)).as("_f"))
    // persisted between the train pass (bucket counts) and the apply
    // pass (per-doc scoring join) as three narrow columns — the same
    // profiled tradeoff as dsirWeights (10×: 5.74s two-scan vs 2.30s
    // persisted, flat at sf0.1); the scored result seals over it
    val feats = uni.unionByName(bi)
      .withColumn("_b", conv(substring(md5(col("_f")), 1, 3), 16, 10).cast("long"))
      .select(col("id"), col("_pos"), col("_b"))
      .persist()
    val counts = feats.groupBy(col("_b"))
      .agg(count(when(col("_pos"), lit(1))).as("_cp"),
        count(when(!col("_pos"), lit(1))).as("_cn"))
    val tot = counts.agg(sum(col("_cp")).as("_np"), sum(col("_cn")).as("_nn"))
    val w = counts.crossJoin(broadcast(tot))
      .withColumn("_w", round(log(
        ((col("_cp") + 1L).cast("double") / (col("_np") + buckets).cast("double")) /
          ((col("_cn") + 1L).cast("double") / (col("_nn") + buckets).cast("double"))), 6)
        .cast("decimal(24,8)"))
      .select(col("_b"), col("_w"))
    // class prior from DOC counts (add-1: a single-class corpus still
    // gets a finite prior)
    val prior = base.agg(round(log(
        (count(when(col("_pos"), lit(1))) + 1L).cast("double") /
          (count(when(!col("_pos"), lit(1))) + 1L).cast("double")), 6)
      .cast("decimal(24,8)").as("_pw"))
    val res = feats.join(broadcast(w), Seq("_b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_feats"), sum(col("_w")).as("_sw"))
      .crossJoin(broadcast(prior))
      .withColumn("score", round((col("_sw") + col("_pw")).cast("double"), 6))
      .select(col("id"), col("n_feats"), col("score"),
        (col("score") > 0.0).as("keep"))
    // the sealed result is one NARROW row per doc (the operator's own
    // output) — materializing it costs one write of the output, far
    // below re-deriving the token stream, and releases the cache
    graft.operators.Caching.sealOver(res, feats)
  }

  /** Shard assignment + within-shard pseudo-random order: shard by
    * the first md5 hex digit of the id (16 shards here; a real export
    * uses O(10k), which also makes the per-shard ordering window as
    * parallel as the cluster), position by the remaining digits — a
    * deterministic global shuffle of training order, reproducible
    * across runs.
    */
  /** Context-window chunking with stride: split each document's token
    * stream into windows of at most `maxLen` tokens starting every
    * `stride` tokens (overlap = maxLen - stride) — the
    * long-document-to-context-window step used when documents must
    * NOT cross sequence boundaries (retrieval passages, BERT-style
    * pretraining, eval harnesses), the per-document complement of
    * [[packSequences]]' cross-document concat-and-cut.
    *
    * Windows start at offsets 0, stride, 2·stride, … and STOP once a
    * window has reached the document end (a start whose PREVIOUS
    * window already covered the last token would emit a chunk wholly
    * contained in its predecessor — pure duplicated training mass;
    * the standard sliding-window rule, e.g. HF overflow chunking,
    * stops there). Every token lands in at least one chunk, the tail
    * chunk may run short, and documents with no tokens drop out.
    * Tokens are whitespace runs (the t-family tokenizer, case
    * preserved — chunking must not alter content).
    *
    * Shape at scale: one narrow row-local pass — per row, a
    * `sequence` of start offsets posexplodes against a `slice` of the
    * doc's own token array. ZERO shuffles at any corpus size; output
    * volume is bounded by n_toks/stride chunks per doc (ceil'd), each
    * carrying ~maxLen/stride × the input bytes, which is the
    * overlap's intrinsic cost, not a plan artifact.
    * Output: (id, chunk_idx, chunk_text, n_toks).
    */
  def chunkWindows(df: DataFrame, idCol: String, textCol: String,
                   maxLen: Int, stride: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen=$maxLen must be >= 1")
    require(stride >= 1 && stride <= maxLen,
      s"stride=$stride must be in [1, maxLen=$maxLen]")
    df.select(col(idCol).as("id"),
        filter(split(col(textCol), "\\s+"), t => length(t) > 0).as("_toks"))
      .filter(size(col("_toks")) > 0)
      .select(col("id"), col("_toks"),
        // keep start s iff no earlier window reached the end:
        // s == 0 or (s - stride) + maxLen < n. The kept set is a
        // PREFIX of the start sequence (the predicate is monotone in
        // s), so posexplode positions still equal s / stride
        posexplode(filter(
          sequence(lit(0), size(col("_toks")) - 1, lit(stride)),
          s => s === 0 || s - stride + maxLen < size(col("_toks"))))
          .as(Seq("chunk_idx", "_start")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("_toks"), col("_start") + 1, lit(maxLen)), " ")
          .as("chunk_text"),
        least(lit(maxLen), size(col("_toks")) - col("_start"))
          .cast("long").as("n_toks"))
  }

  def shardAssign(df: DataFrame, idCol: String): DataFrame = {
    val h = md5(col(idCol).cast("string"))
    val shard = (expr(s"position(substring(md5(cast($idCol as string)), 1, 1), " +
      "'0123456789abcdef')") - 1).cast("long")
    df.withColumn("_h", h)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(substring(col("_h"), 2, 31), col(idCol)))
        .cast("long"))
      .drop("_h")
  }

  /** Curriculum staging (curriculum learning, Bengio et al. 2009, as
    * data pipelines realize it: cut the corpus into quality bands and
    * schedule cleaner bands into later epochs). Stage 1 holds the
    * best-scoring band, stage `nStages` the worst.
    *
    * Assignment is BY SCORE VALUE, not per-row rank (the t18 CCNet
    * device): a doc's stage is floor(strictlyBetter * nStages / n) + 1
    * in INTEGER math, so equal scores always share a stage and no
    * rank tie-break is needed. The corpus never windows — the cut
    * runs on the per-score HISTOGRAM (bounded by distinct rounded
    * score values, orders of magnitude smaller than the corpus; its
    * global window is histogram-sized by construction) and the stage
    * joins back to the scored docs on the score value the histogram
    * grouped on. Stage sizes are n/nStages up to value-tie rounding.
    * Output: (id, score, stage).
    */
  def curriculumStages(df: DataFrame, idCol: String, score: Column,
                       nStages: Int): DataFrame = {
    require(nStages >= 1, s"curriculumStages: nStages=$nStages must be >= 1")
    val scored = df.select(col(idCol).as("id"), score.as("score"))
    val hist = scored.groupBy(col("score")).agg(count(lit(1)).as("_c"))
    val w = Window.orderBy(col("score").desc)
    val cut = hist
      .withColumn("_before", coalesce(sum(col("_c")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // integer div: a long `/` would go through IEEE double and the
      // floor of a near-boundary quotient could differ between engines
      .select(col("score"),
        (expr(s"(_before * $nStages) div _n") + 1L).as("stage"))
    scored.join(cut, Seq("score")).select(col("id"), col("score"), col("stage"))
  }

  /** No-split greedy (next-fit) sequence packing: the complement of
    * [[packSequences]] for recipes that forbid documents crossing a
    * sequence boundary (Krell et al. 2021, "Efficient Sequence Packing
    * without Cross-contamination" — next-fit is its baseline packer).
    * Docs are laid out in id order and greedily appended to the
    * current pack; a doc that would overflow `seqLen` opens a new
    * pack, and an oversized doc (> seqLen) sits alone in its own pack
    * (truncation is the caller's policy, not the packer's).
    *
    * Greedy packing is inherently sequential, so the GLOBAL problem
    * doesn't distribute — the scale move is to make the sequential
    * unit bounded: packs never cross `shardSize`-wide id-range shards.
    * One shuffle on the shard key collects each shard's ≤ shardSize
    * (id, n_toks) PAIRS (16 bytes a row — never text) into a sorted
    * array, and the fold runs row-local as one `aggregate` lambda
    * over that bounded array. Shards are value-derived (id div
    * shardSize) — deterministic under any partitioning, no sampling,
    * trivially balanced at any corpus size. Padding waste vs the
    * global greedy answer is at most one underfull pack per shard
    * boundary.
    *
    * Zero-token docs occupy no space and are dropped (the
    * packSequences rule); null ids have no deterministic shard and
    * are dropped likewise. Negative ids are REJECTED loudly: Spark's
    * integer `div` truncates toward zero where SQL floor-division
    * floors, so a negative id's shard would silently differ between
    * engines — refusing is the only cross-engine-deterministic
    * answer. Output: (id, shard, pack) with pack numbered 0.. within
    * its shard.
    */
  def packGreedy(df: DataFrame, idCol: String, nTokCol: String,
                 seqLen: Long, shardSize: Long = 128L): DataFrame = {
    require(seqLen >= 1, s"packGreedy: seqLen=$seqLen must be >= 1")
    require(shardSize >= 1, s"packGreedy: shardSize=$shardSize must be >= 1")
    // the guard rides the id projection (no extra pass) and fires at
    // first action, the packSequences dupGuard device
    val guardedId = when(col(idCol).cast("long") < 0, raise_error(concat(
        lit("packGreedy: negative id "), col(idCol).cast("string"),
        lit(" — id div shardSize truncates toward zero in Spark but floors " +
          "in SQL, so negative ids shard non-portably"))))
      .otherwise(col(idCol).cast("long"))
    val docs = df
      .filter(col(idCol).isNotNull && col(nTokCol) > 0)
      .select(guardedId.as("_id"),
        col(nTokCol).cast("long").as("_n"))
      .groupBy(expr(s"_id div $shardSize").as("shard"))
      .agg(sort_array(collect_list(struct(col("_id"), col("_n")))).as("_docs"))
    // one sequential next-fit fold per shard, row-local over the
    // bounded array; the CASE repeats in all three accumulator slots
    // because SQL lambdas have no lets — constant-folded by codegen
    val fold = expr(
      s"""aggregate(_docs,
            named_struct(
              'out', CAST(array() AS ARRAY<STRUCT<id: BIGINT, pack: BIGINT>>),
              'pack', 0L, 'fill', 0L),
            (acc, d) -> named_struct(
              'out', array_append(acc.out, named_struct(
                'id', d._id,
                'pack', CASE WHEN acc.fill > 0 AND acc.fill + d._n > $seqLen
                             THEN acc.pack + 1L ELSE acc.pack END)),
              'pack', CASE WHEN acc.fill > 0 AND acc.fill + d._n > $seqLen
                           THEN acc.pack + 1L ELSE acc.pack END,
              'fill', CASE WHEN acc.fill > 0 AND acc.fill + d._n > $seqLen
                           THEN d._n ELSE acc.fill + d._n END),
            acc -> acc.out)""")
    docs.select(col("shard"), explode(fold).as("_d"))
      .select(col("_d.id").as(idCol), col("shard"), col("_d.pack").as("pack"))
  }

  /** Best-fit-decreasing no-split packing (the MAIN packer of Krell
    * et al. 2021 "Efficient Sequence Packing" — [[packGreedy]] is its
    * next-fit baseline): within each shard, docs place LONGEST FIRST
    * and each goes into the fullest already-open pack that still fits
    * (ties to the lowest pack index), opening a new pack only when
    * none fits. BFD's waste bound (≤ 11/9·OPT + 4 packs) is why
    * packing papers default to it; next-fit's single-open-pack rule
    * can waste a near-full pack per boundary.
    *
    * Distribution contract = [[packGreedy]]'s: the inherently
    * sequential fold runs row-local over bounded `shardSize`-doc
    * id-range shards (packs never cross shards, ONE shuffle of
    * (id, n) pairs on the shard key), negative ids fail loudly
    * (div/floor portability), null-id and zero-token docs drop.
    * Oversized docs open their own pack and — being larger than the
    * cap — never admit a neighbor.
    *
    * The best-fit choice is expressed as
    * array_max(filter(fills, f -> f + n <= cap)) + first-position —
    * equal fills are interchangeable, so "first index holding the
    * max feasible fill" IS the lowest-index best fit; the identical
    * expression replays in the oracle's recursive CTE. Output:
    * (id, shard, pack) with pack 0-based per shard.
    */
  def packBestFit(df: DataFrame, idCol: String, nTokCol: String,
                  seqLen: Long, shardSize: Long = 128L): DataFrame = {
    require(seqLen >= 1, s"packBestFit: seqLen=$seqLen must be >= 1")
    require(shardSize >= 1, s"packBestFit: shardSize=$shardSize must be >= 1")
    val guardedId = when(col(idCol).cast("long") < 0, raise_error(concat(
        lit("packBestFit: negative id "), col(idCol).cast("string"),
        lit(" — id div shardSize truncates toward zero in Spark but floors " +
          "in SQL, so negative ids shard non-portably"))))
      .otherwise(col(idCol).cast("long"))
    // sort_array ascending on (-n, id) = the decreasing order with
    // the id tiebreak
    val docs = df
      .filter(col(idCol).isNotNull && col(nTokCol) > 0)
      .select(guardedId.as("_id"), col(nTokCol).cast("long").as("_n"))
      .groupBy(expr(s"_id div $shardSize").as("shard"))
      .agg(sort_array(collect_list(
        struct((-col("_n")).as("_negn"), col("_id"), col("_n")))).as("_docs"))
    // M = the fullest feasible fill; SQL lambdas have no lets, so the
    // expression repeats per accumulator slot (the packGreedy rule)
    val M = s"array_max(filter(acc.fills, f -> f + d._n <= $seqLen))"
    val fold = expr(
      s"""aggregate(_docs,
            named_struct(
              'out', CAST(array() AS ARRAY<STRUCT<id: BIGINT, pack: BIGINT>>),
              'fills', CAST(array() AS ARRAY<BIGINT>)),
            (acc, d) -> named_struct(
              'out', array_append(acc.out, named_struct(
                'id', d._id,
                'pack', CAST(CASE WHEN $M IS NULL THEN size(acc.fills)
                             ELSE array_position(acc.fills, $M) - 1 END AS BIGINT))),
              'fills', CASE WHEN $M IS NULL THEN array_append(acc.fills, d._n)
                       ELSE transform(acc.fills, (f, i) ->
                         CASE WHEN i = array_position(acc.fills, $M) - 1
                              THEN f + d._n ELSE f END) END),
            acc -> acc.out)""")
    docs.select(col("shard"), explode(fold).as("_d"))
      .select(col("_d.id").as(idCol), col("shard"), col("_d.pack").as("pack"))
  }

  /** Deterministic fractional epoch repetition: materialize a mixture
    * recipe that assigns sources non-integer epoch counts (GPT-3's
    * 3.4 epochs of Wikipedia, LLaMA's 2.45 — Brown et al. 2020
    * Table 2.2) as explicit training rows. Every doc appears
    * floor(epochs) times; one extra copy goes to the docs whose md5
    * fraction falls below frac(epochs) — so a source at 2.45 epochs
    * repeats every doc twice and a reproducible, unbiased 45% of them
    * a third time. The md5 draw replaces rand(): the same doc gets
    * the extra copy in every run and in the oracle.
    *
    * `epochsExpr` is a per-row Column of the desired epoch count
    * (typically a CASE over the source column); epochs = 0 drops the
    * doc, fractions compare against the 5-hex-digit md5 prefix
    * exactly as [[mixtureSample]] (floor once to an integer bound,
    * clamped to 'fffff', so both engines compare identical strings).
    * A NULL epoch count fails LOUDLY (the mixtureSample weight
    * contract) — silently dropping those docs would corrupt the mix;
    * null-id docs have no reproducible draw and are dropped (the
    * tokenBudget/packGreedy rule).
    *
    * Shape at scale: zero shuffles — one narrow pass computes the
    * copy count, one explode(sequence) emits it. Output volume is the
    * training mass itself (Σ copies), which is the point; no
    * intermediate exceeds it. Output: (id, epoch) with epoch
    * 0-based.
    */
  /** Weighted sampling without replacement (Efraimidis & Spirakis
    * 2006, algorithm A-ES): keep the k items with the largest
    * u^(1/w) — equivalently, the largest ln(u)/w — where u is a
    * uniform draw in (0,1]. The standard curation use is
    * length- or quality-weighted subcorpus selection where heavier
    * documents must be proportionally more likely to survive (the
    * k=1 inclusion probability is exactly w_i/Σw).
    *
    * Determinism across engines (reference randfilter/rand() would
    * reproduce nowhere): u derives from the row's own identity — the
    * first 8 md5 hex digits of the id parse to an integer h
    * (bit-identical in any engine), and u = (h+1)/2^32 ∈ (0,1] is one
    * exact IEEE division. The rank key ln(u)/w is rounded to 6
    * decimals before comparison (the rounded-cosine rule: libm ln is
    * not pinned to the last ulp across engines; ties break by id).
    *
    * Weights must be strictly positive: NULL or w ≤ 0 fails LOUDLY
    * (the mixtureSample weight contract — a non-positive weight can
    * never be drawn under A-ES, and silently dropping the row would
    * hide a data bug; filter such rows explicitly first). Null-id
    * rows have no reproducible draw and drop (the tokenBudget rule).
    *
    * Shape at scale: zero shuffles — one narrow pass computes the
    * key and the global top-k plans as TakeOrderedAndProject
    * (map-side partial top-k, k rows to the driver), the t09 rule.
    * Output: the input rows + their `_wkey` rank key.
    */
  def weightedSample(df: DataFrame, idCol: String, weightExpr: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"weightedSample: k must be positive, got $k")
    // _wkey is the operator's output rank key — refuse to clobber a
    // pre-existing column of that name (same contract as writeZOrdered)
    require(!df.columns.contains("_wkey"),
      "weightedSample: input already has a column named _wkey")
    val w = when(weightExpr.isNull || weightExpr <= lit(0), raise_error(concat(
        lit("weightedSample: weight must be > 0 for id "),
        coalesce(col(idCol).cast("string"), lit("NULL")))))
      .otherwise(weightExpr.cast("double"))
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val key = round(log((h.cast("double") + lit(1.0d)) / lit(4294967296.0d)) / w, 6)
    df.filter(col(idCol).isNotNull)
      .withColumn("_wkey", key)
      .orderBy(col("_wkey").desc, col(idCol))
      .limit(k)
  }

  def epochRepeat(df: DataFrame, idCol: String, epochsExpr: Column): DataFrame = {
    val ep = when(epochsExpr.isNull, raise_error(concat(
        lit("epochRepeat: epochsExpr is NULL for id "),
        coalesce(col(idCol).cast("string"), lit("NULL")))))
      .otherwise(epochsExpr)
    val whole = floor(ep).cast("long")
    val thr = format_string("%05x",
      least(floor((ep - floor(ep)) * 1048576.0),
        lit(1048575.0)).cast("long"))
    val copies = whole +
      when(substring(md5(col(idCol).cast("string")), 1, 5) < thr, 1L)
        .otherwise(0L)
    df.filter(col(idCol).isNotNull)
      .withColumn("_copies", copies)
      .filter(col("_copies") > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), col("_copies") - 1L)).as("epoch"))
  }

  /** Token-budget waterfill: allocate a global token budget across
    * sources max-min fairly (the Dolma/Pile-style "no domain may
    * drown the mixture" allocation, in TOKENS rather than documents).
    * Find the unique water level L with Σ_s min(T_s, L) <= budget
    * maximal: sources whose total T_s fits under L keep every
    * document; larger sources keep their md5-first documents while
    * the per-source running token sum stays within L. Returns the
    * kept rows (id, source, n_tokens).
    *
    * Exactly-integer solve, oracle-exact: sources sorted by total
    * ascending, with prefix sums; the boundary row i satisfies
    * T_{i-1} <= L_i < T_i for L_i = (budget - P_{i-1}) div (n-i+1) —
    * BIGINT floor division end to end, no floats whose rounding could
    * differ across engines. No valid boundary means Σ T_s <= budget:
    * everything survives. Docs are atomic (a doc whose inclusive
    * cumsum crosses L drops), so a capped source may under-fill by at
    * most one document's tokens.
    *
    * Shape at scale: ONE count/sum aggregate collapses the corpus to
    * |sources| rows; the level solve is windows over that tiny frame
    * (its single-partition window scans |sources| rows, never the
    * corpus — the q25/writeZOrdered rule); the level then
    * cross-broadcasts back as one row and the keep rule is one
    * cumulative-sum window partitioned BY SOURCE — the same shuffle
    * p04/p08 already pay. A pathologically giant single source can
    * route through [[tokenBudget]]'s 4096-bucket prefix device with
    * `source` prepended to the keys; at the benchmark scales the
    * direct per-source window is the honest plan.
    *
    * Null id or source: no hash position / no allocation lane — the
    * repo-wide no-evidence rule — excluded up front, charged nothing.
    */
  /** Data-constrained effective-token accounting (Muennighoff et al.
    * 2023, "Scaling Data-Constrained Language Models" — the repeated-
    * epoch value decay): a source with U unique tokens trained for
    * `alloc/U` epochs contributes effective tokens
    *
    *   D' = U + U · R* · (1 − e^(−R/R*)),  R = max(0, epochs − 1)
    *
    * with the paper's fitted R* ≈ 5.3: the first epoch counts in
    * full, repetition value decays exponentially. The planning view a
    * repeat schedule (p13) should be derived FROM.
    *
    * Engine-exactness: libm exp() rounding is NOT pinned across
    * engines, so e^(−x) evaluates as a degree-[[ExpTerms]] Taylor
    * HORNER chain whose coefficient literals and association order
    * are generated from one place ([[expNegHornerSql]]) — both
    * engines fold the identical IEEE doubles in the identical order,
    * making the whole formula hash-exact. |error| < 1e-7 for x ≤ 4
    * (epochs ≤ ~22). A truncated Taylor series DIVERGES beyond its
    * accurate range (at x≈8 the absolute error is ~0.18, at x≥10 it
    * is off by orders of magnitude), so x is CLAMPED to [[ExpClampX]]
    * = 4 in both engines before the Horner chain: larger x is treated
    * as fully decayed (e^-4 ≈ 0.018, and 1 − e^-x is within 2% of 1),
    * which keeps tiny sources under a large allocation finite and
    * monotone instead of hugely negative.
    *
    * Shape at scale: ONE aggregate collapses the corpus to |sources|
    * rows; everything after is row-local arithmetic on that frame.
    */
  def effectiveTokens(df: DataFrame, sourceCol: String, nTokCol: String,
                      allocPerSource: Double, rstar: Double = 5.3): DataFrame = {
    require(allocPerSource > 0, "effectiveTokens: allocPerSource must be > 0")
    val totals = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(sum(col(nTokCol)).as("unique_tokens"))
    val u = col("unique_tokens").cast("double")
    val epochs = lit(allocPerSource) / u
    val x = least(greatest(lit(0.0), epochs - lit(1.0)) / lit(rstar),
      lit(ExpClampX))
    val expNeg = ExpCoefs.foldRight(null: Column) { (c, acc) =>
      if (acc == null) lit(c) else lit(c) + x * acc
    }
    totals.select(col(sourceCol), col("unique_tokens"),
      round(epochs, 6).as("epochs"),
      round(u + (u * lit(rstar)) * (lit(1.0) - expNeg), 6)
        .as("effective_tokens"))
  }

  /** Taylor coefficients of e^(−x): (−1)^k / k!, k = 0..ExpTerms. */
  val ExpTerms = 20
  val ExpCoefs: Seq[Double] = (0 to ExpTerms).map { k =>
    val fact = (1 to k).foldLeft(1.0)(_ * _)
    (if (k % 2 == 0) 1.0 else -1.0) / fact
  }

  /** Clamp for the Taylor argument: beyond this the chain diverges,
    * and the decay it models is saturated. Shared by the operator and
    * the generated oracle SQL so both engines clamp identically. */
  val ExpClampX = 4.0

  /** The identical Horner chain as SQL text, for the oracle: the
    * coefficient literals are the SAME doubles [[effectiveTokens]]
    * folds, rendered by the same toString; the argument is clamped to
    * [[ExpClampX]] HERE so every oracle caller inherits the same
    * divergence guard as the operator. */
  def expNegHornerSql(xExpr: String): String = {
    val xc = s"least(($xExpr), $ExpClampX)"
    ExpCoefs.reverse.tail.foldLeft(ExpCoefs.last.toString) { (acc, c) =>
      s"($c + ($xc) * ($acc))"
    }
  }

  def tokenWaterfill(df: DataFrame, idCol: String, sourceCol: String,
                     nTokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"tokenWaterfill: budget must be positive, got $budget")
    // a negative token count is a data bug, not an allocation choice:
    // it would silently DEFLATE its source's cumsum and smuggle later
    // docs under the level — fail loudly (the weightedSample rule)
    val guarded = when(col(nTokCol).isNull || col(nTokCol) < 0, raise_error(concat(
        lit("tokenWaterfill: n_tokens must be >= 0 for id "),
        coalesce(col(idCol).cast("string"), lit("NULL")))))
      .otherwise(col(nTokCol).cast("long"))
    val base = df.filter(col(idCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(idCol), col(sourceCol), guarded.as(nTokCol))
    val totals = base.groupBy(col(sourceCol)).agg(sum(col(nTokCol)).as("_t"))
    // tiny frame: |sources| rows. The un-partitioned windows below
    // scan that frame, not the corpus.
    val wAsc = Window.orderBy(col("_t"), col(sourceCol))
    val solved = totals
      .withColumn("_i", row_number().over(wAsc))
      .withColumn("_p", sum(col("_t")).over(wAsc)) // inclusive prefix
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(lit(1)).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("_prevT", coalesce(lag(col("_t"), 1).over(wAsc), lit(0L)))
      // level if sources i..n all cap: (budget - P_{i-1}) div (n-i+1).
      // BIGINT `div`, not floor(double /): exact past 2^53. A negative
      // numerator (P_{i-1} > budget) truncates differently than a
      // floor would, but such rows can never pass the boundary filter
      // (it would force _prevT = 0 hence P_{i-1} = 0 <= budget).
      .withColumn("_lvl",
        expr(s"(${budget}L - (_p - _t)) div (_n - _i + 1)"))
      .filter(col("_prevT") <= col("_lvl") && col("_lvl") < col("_t"))
      .select(min(col("_lvl")).as("_lvl")) // unique row; min() = scalar shape
    // no boundary row -> sum fits -> unbounded level
    val level = solved.select(coalesce(col("_lvl"), lit(Long.MaxValue)).as("_lvl"))
    val wSrc = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    base
      .withColumn("_cum", sum(col(nTokCol)).over(wSrc))
      .crossJoin(broadcast(level))
      .filter(col("_cum") <= col("_lvl"))
      .drop("_cum", "_lvl")
  }

  /** FIM (fill-in-the-middle) span assignment (Bavarian et al. 2022,
    * "Efficient Training of Language Models to Fill in the Middle" —
    * the transformation every code-model pipeline applies at the
    * published ~0.5 rate): a deterministically hash-gated fraction of
    * documents is marked for FIM; each marked document gets two cut
    * points over its whitespace token count splitting it
    * prefix/middle/suffix, and a further hash channel picks PSM vs
    * SPM ordering (the paper trains a 50/50 joint mixture of both).
    * Everything derives from md5 channels of the doc id — the same
    * device as p02/p05, so a document's transformation never changes
    * as the corpus grows or repartitions, and an epoch is exactly
    * reproducible.
    *
    * Cut points are independent uniform draws over [0, n] (two 15-hex
    * md5 channels mod n+1, order-normalized) — the paper's
    * "uniformly at random" span, so middles of every size including
    * empty appear. Unmarked documents pass through whole
    * (n_prefix = n, order "none").
    *
    * Shape at scale: strictly row-local — one projection pass, no
    * shuffle, no window; composes in front of p01/p12/p15 packing
    * unchanged. Output: (id, n_toks, is_fim, n_prefix, n_middle,
    * n_suffix, fim_order).
    */
  def fimSplit(df: DataFrame, idCol: String, textCol: String,
               fimRate: Double = 0.5): DataFrame = {
    require(fimRate >= 0 && fimRate <= 1,
      s"fimSplit: fimRate $fimRate must be in [0,1]")
    val thr = f"${math.min(math.floor(fimRate * 1048576.0).toLong, 1048575L)}%05x"
    val idStr = col(idCol).cast("string")
    val n = when(length(trim(col(textCol))) === 0, 0L)
      .otherwise(size(split(trim(col(textCol)), "\\s+")).cast("long"))
    def chan(tag: String): Column =
      conv(substring(md5(concat(idStr, lit(tag))), 1, 15), 16, 10).cast("long")
    val isFim = substring(md5(idStr), 1, 5) < thr
    val c1 = chan(":c1") % (n + 1L)
    val c2 = chan(":c2") % (n + 1L)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    df.select(col(idCol).as("id"), n.as("n_toks"), isFim.as("is_fim"),
        when(isFim, lo).otherwise(n).as("n_prefix"),
        when(isFim, hi - lo).otherwise(0L).as("n_middle"),
        when(isFim, n - hi).otherwise(0L).as("n_suffix"),
        when(!isFim, "none")
          .when(substring(md5(concat(idStr, lit(":o"))), 1, 1) < "8", "psm")
          .otherwise("spm").as("fim_order"))
  }
}
