package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VecDot

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — the query set is small by
  * definition, so it broadcasts and the scan is one shuffle-free pass
  * over the corpus followed by a top-k per query. Scale path:
  * random-hyperplane LSH buckets cut the candidate set per query —
  * sublinear probe cost at 100 TB corpus size.
  *
  * All dot products go through [[VecDot]], a fused codegen loop;
  * norms are computed ONCE per vector before pairing, never per pair
  * — per-candidate work is exactly one multiply-accumulate pass.
  */
object Similarity {

  /** Cosine similarity between two numeric arrays. Prefer the
    * precomputed-norm forms below in pair loops.
    */
  def cosine(a: Column, b: Column): Column =
    VecDot.dot(a, b) / (sqrt(VecDot.dot(a, a)) * sqrt(VecDot.dot(b, b)))

  /** L2 norm of a vector, for one-time precomputation. */
  def norm(v: Column): Column = sqrt(VecDot.dot(v, v))

  /** Brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine. `queries` must be small (it is broadcast).
    * Ties break on corpus id for determinism.
    */
  def bruteTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                queries: DataFrame, queryId: String, queryVec: String,
                k: Int): DataFrame = {
    val c = corpus.withColumn("_cnrm", norm(col(corpusVec)))
    val q = queries.withColumn("_qnrm", norm(col(queryVec)))
    val scored = c
      .crossJoin(broadcast(q))
      .withColumn("cos",
        VecDot.dot(col(corpusVec), col(queryVec)) / (col("_cnrm") * col("_qnrm")))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Multi-table, MULTI-PROBE LSH ANN: `numTables` independent
    * hyperplane signatures; a corpus row is a candidate for a query if
    * they share ANY table's bucket, where the query also probes every
    * bucket within Hamming distance `probeRadius` of its signature
    * (Lv et al.'s multi-probe LSH — the neighbor most likely to hold a
    * near miss differs in exactly one plane's sign). Candidates are
    * deduped, then exact cosine + top-k.
    *
    * Recall per table goes from p^planes to P(<=radius planes
    * disagree), a large jump when p is middling (near-orthogonal
    * neighbors); cost-wise the probe expansion lands on the QUERY side
    * of the join — the broadcast-small side — so the corpus-side work
    * (one signature row per table) is unchanged and candidates stay
    * sublinear in corpus size.
    */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, numPlanes: Int = 6, numTables: Int = 8,
              probeRadius: Int = 1): DataFrame = {
    require(probeRadius <= 1, "probeRadius > 1 not implemented")
    // one fused pass per vector for ALL tables' signatures, then
    // posexplode tags each signature with its table index
    def withSig(df: DataFrame, vec: String): DataFrame = df
      .select(col("*"),
        posexplode(graft.functions.LshSigs.sigs(col(vec), numPlanes, numTables))
          .as(Seq("_t", "_sig")))
    val cb = withSig(corpus, corpusVec)
      .withColumn("_sg", struct(col("_t"), col("_sig")))
      .drop("_t", "_sig")
      .withColumn("_cnrm", norm(col(corpusVec)))
    val qsigs = withSig(queries, queryVec)
    val probed =
      if (probeRadius == 0) qsigs
      else qsigs.withColumn("_sig", explode(array(
        col("_sig") +: (0 until numPlanes).map(p =>
          col("_sig").bitwiseXOR(lit(1L << p))): _*)))
    val qb = probed
      .withColumn("_sg", struct(col("_t"), col("_sig")))
      .drop("_t", "_sig")
      .withColumn("_qnrm", norm(col(queryVec)))
    val scored = cb
      .join(broadcast(qb), "_sg")
      .withColumn("cos",
        VecDot.dot(col(corpusVec), col(queryVec)) / (col("_cnrm") * col("_qnrm")))
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        round(col("cos"), 6).as("cos"))
      .dropDuplicates("query_id", "neighbor_id") // same pair via >1 table
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN — the classic scale path next to LSH.
    *
    * Coarse quantizer: `nlist` centroids sampled deterministically
    * from the corpus itself (lowest xxhash64(id) — a uniform
    * pseudo-random sample with no driver-side RNG to ship), then
    * tightened by `refineIters` Lloyd passes (assign + re-center on
    * the list mean), which is what turns arbitrary seed points into a
    * quantizer whose lists actually partition the space. Corpus
    * rows are assigned to their nearest centroid in ONE broadcast
    * pass; queries probe their `nprobe` nearest centroids and scan
    * only those inverted lists. Candidate work per query is
    * ~|corpus| * nprobe / nlist instead of |corpus|.
    *
    * At 100 TB: the assignment pass is a narrow map (centroids are a
    * broadcast table), the probe join shuffles only on centroid id,
    * and each inverted list is a normal partition-parallel scan.
    */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, nlist: Int = 64, nprobe: Int = 4,
              refineIters: Int = 1, spill: Int = 1): DataFrame = {
    def nearest(df: DataFrame, cents: DataFrame, id: String, vec: String,
                nrm: Column, take: Int) = {
      val w = Window.partitionBy(col(id))
        .orderBy(col("_cent_cos").desc, col("_cent_id"))
      df.crossJoin(broadcast(cents))
        .withColumn("_cent_cos",
          VecDot.dot(col(vec), col("_cent_vec")) / (nrm * col("_cent_nrm")))
        .withColumn("_cent_rank", row_number().over(w))
        .filter(col("_cent_rank") <= take)
        .drop("_cent_vec", "_cent_nrm", "_cent_cos", "_cent_rank")
    }

    var cents = corpus
      .withColumn("_h", xxhash64(col(corpusId)))
      .orderBy(col("_h"), col(corpusId))
      .limit(nlist)
      .select(col(corpusId).as("_cent_id"), col(corpusVec).as("_cent_vec"),
        norm(col(corpusVec)).as("_cent_nrm"))

    // Lloyd refinement: hash-sampled seeds are arbitrary corpus points,
    // so lists are lopsided; each pass re-centers every list on the
    // element-wise mean of its members (decimal-summed — bit-identical
    // under any partitioning, so probe choices are deterministic).
    // One pass = one broadcast assign + one (list, pos) shuffle; lists
    // that capture no members drop out (standard k-means behavior).
    for (_ <- 0 until refineIters) {
      val assigned = nearest(corpus.withColumn("_cnrm", norm(col(corpusVec))),
        cents, corpusId, corpusVec, col("_cnrm"), 1)
      cents = assigned
        .select(col("_cent_id"), posexplode(col(corpusVec)).as(Seq("_pos", "_x")))
        .groupBy(col("_cent_id"), col("_pos"))
        .agg((sum(col("_x").cast("double").cast("decimal(28,12)")).cast("double")
          / count(lit(1)).cast("double")).as("_m"))
        .groupBy(col("_cent_id"))
        .agg(sort_array(collect_list(struct(col("_pos"), col("_m")))).as("_pm"))
        .select(col("_cent_id"),
          expr("transform(_pm, s -> s._m)").as("_cent_vec"))
        .withColumn("_cent_nrm", norm(col("_cent_vec")))
    }

    // `spill` > 1 = assignment replication: each corpus vector joins
    // its top-`spill` lists, so a neighbor sitting just across a
    // Voronoi boundary from the query's probed cells is still found.
    // Costs spill× list storage/scan — the classic IVF recall lever
    // next to nprobe (refinement keeps take=1: true Lloyd k-means).
    val c = nearest(corpus.withColumn("_cnrm", norm(col(corpusVec))),
      cents, corpusId, corpusVec, col("_cnrm"), spill)
    val q = nearest(queries.withColumn("_qnrm", norm(col(queryVec))),
      cents, queryId, queryVec, col("_qnrm"), nprobe)

    val scored = c.join(broadcast(q), "_cent_id")
      .withColumn("cos",
        VecDot.dot(col(corpusVec), col(queryVec)) / (col("_cnrm") * col("_qnrm")))
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        round(col("cos"), 6).as("cos"))
      .dropDuplicates("query_id", "neighbor_id") // same pair via two spilled lists
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max|x| / 127, code_i = floor(x_i / scale) ∈ [-127, 127].
    * The 4x storage/bandwidth cut is THE lever for shipping an
    * embedding corpus at 100 TB scale (dot products then run in int
    * SIMD against the shared scale). floor — not round — so the
    * quantization is bit-deterministic across engines and the oracle
    * can verify codes exactly; all-zero vectors quantize to code 0
    * with scale 0. Output: (id, pos, code, scale) rows.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = array_max(transform(col(vecCol), x => abs(x.cast("double")))) / lit(127.0)
    df.select(col(idCol).as("id"), col(vecCol).as("_v"), scale.as("scale"))
      .select(col("id"), col("scale"), posexplode(col("_v")).as(Seq("pos", "x")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        when(col("scale") === 0, lit(0L))
          .otherwise(floor(col("x").cast("double") / col("scale")).cast("long"))
          .as("code"),
        col("scale"))
  }

  /** Per-label centroids as (label, pos, c) rows: element-wise mean of
    * the embedding column. posexplode keeps it declarative — partial
    * aggregation combines map-side, the single shuffle key is
    * (label, pos), and no executor ever holds more than one running
    * (sum, count) per dimension. Sums go through DECIMAL so the mean
    * is order-independent (bit-identical under any partitioning).
    */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg((sum(col("x").cast("double").cast("decimal(28,12)")).cast("double")
        / count(lit(1)).cast("double")).as("c"))

  /** Scale path for embedding near-dup: multi-table hyperplane LSH
    * buckets the corpus, candidate pairs form only within buckets
    * (id1 < id2, deduped across tables), then the exact cosine
    * verifies. Work is O(sum of bucket^2) per table instead of
    * O(n^2); recall follows the 1-(1-p^planes)^tables curve and rises
    * with `numTables`. The exact [[cosinePairs]] below remains for
    * oracle-sized slices.
    *
    * `maxBucket` drops (table, signature) buckets holding more than
    * that many vectors BEFORE the self-join — same role as
    * [[Dedup.lshCandidates]]' cap: a degenerate hyperplane bucket
    * (e.g. a mass of near-identical embeddings) would otherwise go
    * quadratic at corpus scale. Pairs that genuinely agree still meet
    * in one of the other tables' buckets.
    */
  def cosinePairsLsh(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, numPlanes: Int = 6,
                     numTables: Int = 8,
                     maxBucket: Option[Int] = None): DataFrame = {
    val base0 = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("_nrm", norm(col("v")))
      .select(col("id"), col("v"), col("_nrm"),
        posexplode(graft.functions.LshSigs.sigs(col("v"), numPlanes, numTables))
          .as(Seq("_t", "_sig")))
    val base = maxBucket match {
      case Some(m) =>
        val wb = Window.partitionBy(col("_t"), col("_sig"))
        base0.withColumn("_bsz", count(lit(1)).over(wb))
          .filter(col("_bsz") <= m).drop("_bsz")
      case None => base0
    }
    val cand = base.as("a")
      .join(base.as("b"),
        col("a._t") === col("b._t") && col("a._sig") === col("b._sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("a.v").as("v1"), col("a._nrm").as("n1"),
        col("b.id").as("id2"), col("b.v").as("v2"), col("b._nrm").as("n2"))
      .dropDuplicates("id1", "id2")
    cand
      .withColumn("cos", VecDot.dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
  }

  /** Embedding near-duplicate pairs: all (id1 < id2) with cosine >=
    * threshold. O(n^2) — callers bound the input (LSH buckets or a
    * partition key) at scale; used directly for oracle-sized slices.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id1"), col(vecCol).as("v1"),
      norm(col(vecCol)).as("n1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).as("v2"),
      norm(col(vecCol)).as("n2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", VecDot.dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
  }
}
