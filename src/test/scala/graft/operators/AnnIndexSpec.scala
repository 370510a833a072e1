package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persistent ANN index (s26): the build/serve split must serve a
  * query batch from the STORE alone with results identical to the
  * end-to-end ivfPqTopK run — including after both store relations
  * round-trip through parquet.
  */
class AnnIndexSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("embedding", transform(col("embedding"),
      x => x.cast("double") / Similarity.norm(col("embedding"))))

  private lazy val cb = Similarity.trainPqCodebook(
    emb, "vec_id", "embedding", m = 16, ksub = 256, iters = 2)

  private def served(cents: org.apache.spark.sql.DataFrame,
                     postings: org.apache.spark.sql.DataFrame) =
    Similarity.annIndexTopK(cents, postings,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        cb, "code", "codeword", m = 16, k = 10, nprobe = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))

  test("store-served results equal the end-to-end IVF-PQ run bit for bit") {
    val (cents, postings) = Similarity.buildAnnIndex(emb, "vec_id",
      "embedding", cb, "code", "codeword",
      m = 16, nlist = 16, refineIters = 4, spill = 2)
    val endToEnd = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        cb, "code", "codeword",
        m = 16, k = 10, nlist = 16, nprobe = 8, refineIters = 4, spill = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    assert(endToEnd.nonEmpty)
    assert(served(cents, postings) == endToEnd)
  }

  test("the store survives a parquet round-trip unchanged") {
    val (cents, postings) = Similarity.buildAnnIndex(emb, "vec_id",
      "embedding", cb, "code", "codeword",
      m = 16, nlist = 16, refineIters = 4, spill = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toFile
    cents.write.mode("overwrite").parquet(dir + "/centroids")
    postings.write.mode("overwrite").parquet(dir + "/postings")
    val back = served(spark.read.parquet(dir + "/centroids"),
      spark.read.parquet(dir + "/postings"))
    assert(back == served(cents, postings))
    // the store is text/vector-free: only ids, codes, and the tiny
    // quantizer — the corpus-append contract
    val pCols = spark.read.parquet(dir + "/postings").columns.sorted.toSeq
    assert(pCols == Seq("cent_id", "codes", "id"), pCols.toString)
  }

  test("append equals re-encode under the fixed quantizer; replays can't double-post") {
    val half = emb.filter(col("vec_id") < 250)
    val rest = emb.filter(col("vec_id") >= 250)
    val (cents, p1) = Similarity.buildAnnIndex(half, "vec_id", "embedding",
      cb, "code", "codeword", m = 16, nlist = 16, refineIters = 4, spill = 2)
    val appended = Similarity.appendAnnIndex(cents, p1, rest,
      "vec_id", "embedding", cb, "code", "codeword", m = 16, spill = 2)
    // reference: the same fixed quantizer encoding the full corpus
    val full = Similarity.appendAnnIndex(cents,
      p1.limit(0), emb, "vec_id", "embedding", cb, "code", "codeword",
      m = 16, spill = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).mkString("/"))).toSet
    assert(rows(appended) == rows(full))
    // served results now see the appended half
    val hits = served(cents, appended).map(_._2).toSet
    assert(hits.exists(_ >= 250L), "appended vectors never surfaced")
    // replaying the same batch is a no-op
    val replay = Similarity.appendAnnIndex(cents, appended, rest,
      "vec_id", "embedding", cb, "code", "codeword", m = 16, spill = 2)
    assert(rows(replay) == rows(appended))
  }

  test("the 128-centroid read contract is enforced") {
    val s = spark
    import s.implicits._
    val cents = (1L to 200L).map(i => (i, Array.fill(4)(0.1), 0.2))
      .toDF("cent_id", "cent_vec", "cent_nrm")
    val postings = Seq((1L, 1L, Array(0L))).toDF("cent_id", "id", "codes")
    val e = intercept[Exception] {
      Similarity.annIndexTopK(cents, postings,
        emb.filter(col("vec_id") < 2), "vec_id", "embedding",
        cb, "code", "codeword", m = 16, k = 5)
    }
    assert(e.getMessage.contains("128"), e.getMessage)
  }
}
