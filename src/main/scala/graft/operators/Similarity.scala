package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — the query set is small by
  * definition, so it broadcasts and the scan is one shuffle-free pass
  * over the corpus followed by a top-k per query (partial top-k
  * map-side via window + AQE). Scale path: random-hyperplane LSH
  * buckets cut the candidate set per query to one bucket (or a few,
  * multi-probe) — sublinear probe cost at 100 TB corpus size.
  */
object Similarity {

  /** Cosine similarity between two double arrays, as one expression
    * tree (zip_with + aggregate fold — sequential, deterministic
    * order, codegen'd).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine. `queries` must be small (it is broadcast).
    * Ties break on corpus id for determinism.
    */
  def bruteTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                queries: DataFrame, queryId: String, queryVec: String,
                k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .withColumn("cos", cosine(asDouble(col(corpusVec)), asDouble(col(queryVec))))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane,
    * dim): a hash folded to [-0.5, 0.5). Generated identically on
    * every executor — no driver-side randomness to ship.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(concat(lit(s"plane$plane|"), dim.cast("string"))), lit(1000000L))
      .cast("double") / 1000000.0) - 0.5

  /** Random-hyperplane signature: bit p = sign(v . h_p). */
  def lshSignature(vec: Column, numPlanes: Int): Column = {
    val v = asDouble(vec)
    (0 until numPlanes).map { p =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed ANN: queries and corpus are bucketed by hyperplane
    * signature; candidates = same-bucket corpus rows; exact cosine +
    * top-k within candidates. Trades recall for a candidate set
    * ~corpus/2^planes per query.
    */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, numPlanes: Int = 8): DataFrame = {
    val cb = corpus.withColumn("_sig", lshSignature(col(corpusVec), numPlanes))
    val qb = queries.withColumn("_sig", lshSignature(col(queryVec), numPlanes))
    val scored = cb
      .join(broadcast(qb), "_sig")
      .withColumn("cos", cosine(asDouble(col(corpusVec)), asDouble(col(queryVec))))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col(corpusId).as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Embedding near-duplicate pairs: all (id1 < id2) with cosine >=
    * threshold. O(n^2) — callers bound the input (LSH buckets or a
    * partition key) at scale; used directly for oracle-sized slices.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", cosine(asDouble(col("v1")), asDouble(col("v2"))))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("cos"))
  }
}
