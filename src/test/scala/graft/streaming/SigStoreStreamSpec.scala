package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming sig-store dedup: the stateless stream-static band join
  * must reproduce the batch [[Dedup.sigStoreDedup]] pair for pair.
  */
class SigStoreStreamSpec extends SparkSpec {

  test("stream output equals batch sig-store dedup across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 500)
    val store = Dedup.portableSignatureStore(
      docs.filter(col("doc_id") < 250), "doc_id", "text").persist()
    val incoming = docs.filter(col("doc_id") >= 250)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()

    val batch = Dedup.sigStoreDedup(store, docs.filter(col("doc_id") >= 250),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "no cross-half near-dups — test is vacuous")

    val input = MemoryStream[(Long, String)]
    val q = Dedup.sigStoreDedupStream(store,
        input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("sigstream")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = incoming.splitAt(incoming.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      val streamed = s.table("sigstream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
    } finally { q.stop(); store.unpersist(); () }
  }

  test("a pair colliding in every band still emits exactly once") {
    val s = spark
    import s.implicits._
    val text = "the exact same document text appears on both sides here today"
    val store = Dedup.portableSignatureStore(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
    // batch-mode invocation of the STREAM operator (same plan, no
    // micro-batch driver): an identical doc matches all 4 bands and
    // all 8 components — the first-band tie-break must emit one row
    val out = Dedup.sigStoreDedupStream(store,
        Seq((10L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    assert(out.length == 1, s"expected 1 row, got ${out.toSeq}")
    assert(out(0).getLong(2) == 8L && out(0).getDouble(3) == 1.0)
  }
}
