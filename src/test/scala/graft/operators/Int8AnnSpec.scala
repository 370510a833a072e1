package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Symmetric int8-quantized ANN (s20, the FAISS SQ8 search shape):
  * quality vs the brute float baseline, plus the no-evidence rule for
  * zero vectors. The score itself is oracle-exact (integer sums), so
  * this spec gates the thing the oracle can't: how much ranking
  * quality floor quantization costs.
  */
class Int8AnnSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("recall@10 vs brute float cosine is >= 0.95 at sf0.001") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val truth = Similarity.bruteTopK(emb, "vec_id", "embedding",
        q, "qid", "qvec", k = 10)
      .select("query_id", "neighbor_id")
    val got = Similarity.int8TopK(emb, "vec_id", "embedding",
        q, "qid", "qvec", k = 10)
      .select("query_id", "neighbor_id")
    val hit = got.join(truth, Seq("query_id", "neighbor_id")).count()
    val total = truth.count()
    assert(total == 50, s"expected 5 queries x 10, got $total")
    assert(hit >= (total * 0.95).toLong, s"recall ${hit.toDouble / total}")
  }

  test("zero vectors are excluded from both sides, not ranked at cosine 0") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 0.0f))) // no code evidence
      .toDF("vec_id", "embedding")
    val q = Seq(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f))) // zero query: no results at all
      .toDF("qid", "qvec")
    val got = Similarity.int8TopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", k = 10)
      .collect()
    assert(got.forall(_.getLong(1) != 3L), got.mkString(","))
    assert(got.forall(_.getLong(0) != 11L), got.mkString(","))
    assert(got.count(_.getLong(0) == 10L) == 2)
  }

  test("the quantized cosine tracks the float cosine within 2e-2") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding",
        q, "qid", "qvec", k = 10)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val int8 = Similarity.int8TopK(emb, "vec_id", "embedding",
        q, "qid", "qvec", k = 10)
      .select(col("query_id"), col("neighbor_id"), col("qcos"))
    val maxErr = brute.join(int8, Seq("query_id", "neighbor_id"))
      .agg(max(abs(col("cos") - col("qcos")))).head.getDouble(0)
    assert(maxErr < 2e-2, s"max |cos - qcos| = $maxErr")
  }
}
