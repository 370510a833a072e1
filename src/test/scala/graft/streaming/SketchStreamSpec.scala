package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.SketchStore

/** Streaming sketch stores (the d26 twins): Complete-mode streaming
  * aggregation keeps the KMV/CMS state in the state store between
  * micro-batches — the emitted store must equal the batch build over
  * everything ingested so far, bit for bit. This exercises the
  * aggregate's serialize/merge/deserialize path under the streaming
  * state store, the same merge batch partial-aggregation uses.
  */
class SketchStreamSpec extends SparkSpec {

  private def toks(df: org.apache.spark.sql.DataFrame) = df
    .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("tok"))
    .filter(length(col("tok")) > 0)

  test("KMV stream state across micro-batches == batch store, bit for bit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source"), col("text")).as[(String, String)].collect()
    val input = MemoryStream[(String, String)]
    val q = SketchStore.kmvStoreStream(
        toks(input.toDF().toDF("source", "text")), "source", md5(col("tok")), 16)
      .writeStream.format("memory").queryName("kmvstream")
      .outputMode(OutputMode.Complete()).start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      // mid-stream: state equals the batch build over the first half
      val half = s.table("kmvstream").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val halfBatch = SketchStore.kmvStore(
          toks(a.toSeq.toDF("source", "text")), "source", md5(col("tok")), 16)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(half == halfBatch)

      input.addData(b.toSeq); q.processAllAvailable()
      val full = s.table("kmvstream").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val fullBatch = SketchStore.kmvStore(
          toks(docs.toSeq.toDF("source", "text")), "source", md5(col("tok")), 16)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(full == fullBatch)
    } finally { q.stop(); () }
  }

  test("CMS stream grid across micro-batches == batch grid") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100)
      .select(col("source"), col("text")).as[(String, String)].collect()
    val input = MemoryStream[(String, String)]
    val q = SketchStore.cmsStoreStream(
        toks(input.toDF().toDF("source", "text")), "source", col("tok"),
        lit(1L), 128, 4)
      .writeStream.format("memory").queryName("cmsstream")
      .outputMode(OutputMode.Complete()).start()
    try {
      val (a, b) = docs.splitAt(docs.length / 3)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      val streamed = s.table("cmsstream").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val batch = SketchStore.cmsStore(
          toks(docs.toSeq.toDF("source", "text")).groupBy("source", "tok")
            .agg(count(lit(1)).as("c")),
          "source", col("tok"), col("c"), 128, 4)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(streamed == batch)
    } finally { q.stop(); () }
  }
}
