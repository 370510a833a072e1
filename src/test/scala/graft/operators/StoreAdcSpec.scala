package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Portable store-served ADC (s44 — the oracle-exact twin of the s26
  * serve path): probe-all serving must equal the plain pqAdcTopK scan
  * bit for bit (with every list probed, the store restricts nothing,
  * so any divergence is a serve-path bug), the store must survive a
  * parquet round-trip, and its schema must be vector-free.
  */
class StoreAdcSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val cents = Similarity.kmeansCentroids(
    emb, "vec_id", "embedding", k = 8, iters = 3, dims = 64)
  private lazy val cb = emb.filter(col("vec_id") < 16)
  private lazy val store = Similarity.buildPortableAnnStore(
    emb, "vec_id", "embedding", cents, cb, "vec_id", "embedding",
    m = 8, dims = 64)

  private def serve(postings: org.apache.spark.sql.DataFrame,
                    nprobe: Int) =
    Similarity.storeAdcPortable(postings,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        cents, cb, "vec_id", "embedding",
        m = 8, k = 10, nprobe = nprobe, dims = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))

  test("probe-all store serve equals the plain ADC scan bit for bit") {
    val full = Similarity.pqAdcTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 5), "vec_id", "embedding",
        cb, "vec_id", "embedding", m = 8, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sortBy(t => (t._1, t._4))
    assert(full.nonEmpty)
    assert(serve(store, nprobe = cents.length) == full)
  }

  test("the store survives a parquet round-trip; schema is vector-free") {
    val dir = java.nio.file.Files.createTempDirectory("graft-storeadc").toFile
    store.write.mode("overwrite").parquet(dir + "/postings")
    val back = spark.read.parquet(dir + "/postings")
    assert(serve(back, nprobe = 2) == serve(store, nprobe = 2))
    assert(back.columns.sorted.toSeq == Seq("cent_id", "codes", "id"))
  }

  test("narrow probes serve a subset of the probe-all ranking's pool") {
    // nprobe=2 candidates are a subset of the corpus, so every served
    // neighbor must appear in the probed lists — and the serve result
    // at nprobe=k is already pinned to the full scan above
    val two = serve(store, nprobe = 2)
    assert(two.nonEmpty)
    val probedIds = store.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(two.forall(t => probedIds(t._2)))
  }
}
