package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming normalized dedup (the d29 twin): the stream must keep
  * exactly the batch operator's keepers — normalization variants
  * arriving across micro-batches drop against the first copy's state.
  */
class NormalizedDedupStreamSpec extends SparkSpec {

  test("stream survivors == batch keepers across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val batch1 = Seq(
      (1L, ts(1), "Hello,  World!"),
      (2L, ts(2), "a different document."))
    val batch2 = Seq(
      (3L, ts(3), "hello world"),        // d29-variant of 1: drops
      (4L, ts(4), "A DIFFERENT document"), // variant of 2: drops
      (5L, ts(5), "genuinely new text"))

    val all = (batch1 ++ batch2).toDF("doc_id", "ts", "text")
    val batchKeepers = Dedup.normalizedExact(all, "doc_id", "text")
      .collect().map(_.getLong(2)).toSet

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = Dedup.streamingNormalizedExact(
        input.toDF().toDF("doc_id", "ts", "text"), "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName("normstream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      val streamed = s.table("normstream")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batchKeepers,
        s"stream $streamed vs batch $batchKeepers")
      assert(streamed == Set(1L, 2L, 5L), streamed)
    } finally { q.stop(); () }
  }
}
