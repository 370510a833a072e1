package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins that streaming state is actually BOUNDED by the watermark —
  * not just claimed to be. The state-operator progress metrics are the
  * evidence a 100 TB deployment would alert on: numRowsTotal must fall
  * back down when windows close, or the job eventually OOMs its state
  * store no matter how big the cluster.
  */
class StateMetricsSpec extends SparkSpec {

  test("window state rows are evicted once the watermark closes the window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(Long, String)]
    val agg = input.toDF().toDF("sec", "key")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("key"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("state_metrics")
      .outputMode("append").start()
    try {
      def stateRows: Long = {
        // the last progress entry carrying state metrics (no-data
        // batches report them too)
        val ps = q.recentProgress.filter(_.stateOperators.nonEmpty)
        ps.last.stateOperators.head.numRowsTotal
      }
      // two keys in window [0,60) -> two state rows held open
      input.addData((10L, "a"), (20L, "b"))
      q.processAllAvailable()
      assert(stateRows == 2L, s"expected 2 open window-key groups, got $stateRows")

      // an event far ahead advances the watermark past 60s: both groups
      // of the first window emit and are EVICTED; only the new window's
      // single group remains
      input.addData((300L, "a"))
      q.processAllAvailable()
      assert(stateRows == 1L, s"expected only the open window's group, got $stateRows")

      val emitted = spark.table("state_metrics")
        .select(col("window.start").cast("long"), col("key"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(emitted == Set((0L, "a", 1L), (0L, "b", 1L)), emitted.toString)
    } finally q.stop()
  }

  test("streaming near-dup bucket state is evicted by the event-time timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = (1 to 40).map(i => s"word$i").mkString(" ") + " tail marker words"
    val input = MemoryStream[(Long, Long, String)]
    val df = input.toDF().toDF("id", "tsSec", "text")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
    val q = graft.operators.Dedup.streamingNearDupCandidates(
        df, "id", "text", "ts", "1 minute")
      .writeStream.format("memory").queryName("neardup_state")
      .outputMode("append").start()
    try {
      def stateRows: Long = {
        val ps = q.recentProgress.filter(_.stateOperators.nonEmpty)
        ps.last.stateOperators.head.numRowsTotal
      }
      input.addData((1L, 100L, base))
      q.processAllAvailable()
      val open = stateRows
      assert(open > 0L, "band buckets should be held in state")
      // push the watermark far past ts+delay: every bucket times out
      input.addData((9L, 10000L, "completely unrelated different text entirely"))
      q.processAllAvailable()
      // one more batch so timed-out state from the previous watermark
      // advance is physically removed
      input.addData((10L, 10010L, "more unrelated text to tick the clock"))
      q.processAllAvailable()
      assert(stateRows < open + 8,
        s"doc-1 buckets must have timed out (open=$open, now=$stateRows)")
    } finally q.stop()
  }
}
