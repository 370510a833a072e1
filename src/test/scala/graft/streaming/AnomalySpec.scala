package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows
import Anomaly.{Alert, Event}

/** Streaming rolling z-score anomaly (the r16 batch op live). */
class AnomalySpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[(String, Long)]]): Seq[Alert] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, Long)]
    val events = input.toDF().toDF("key", "tsSec")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .select("key", "ts").as[Event]
    val name = s"anom_${System.nanoTime()}"
    val q = Anomaly.alerts(events)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Alert].collect().toSeq
        .sortBy(a => (a.key, a.hr_start))
    } finally q.stop()
  }

  private def hourlyEvents(counts: Seq[(Long, Int)], key: String = "click") =
    counts.flatMap { case (hr, n) =>
      (1 to n).map(i => (key, hr * 3600L + i))
    }

  test("stream scores the same hours with the same z as the batch operator") {
    // 24h alternating 9/11, then a 20-count spike, then a flush hour
    val hist = (0L until 24L).map(h => h -> (if (h % 2 == 0) 9 else 11))
    val all = hist ++ Seq(24L -> 20, 25L -> 1, 30L -> 1)
    // split mid-history across batches; the final hour closes 24/25
    val rows = hourlyEvents(all)
    val streamed = runStream(Seq(
      rows.filter(_._2 < 12L * 3600L),
      rows.filter(r => r._2 >= 12L * 3600L && r._2 < 25L * 3600L),
      rows.filter(_._2 >= 25L * 3600L)))
    val s = spark
    import s.implicits._
    val batch = Windows.rateAnomaly(
        rows.toDF("event_type", "epoch")
          .withColumn("ts", timestamp_seconds(col("epoch"))),
        "ts", "event_type")
      .collect().map(r => Alert(r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getBoolean(5)))
      .toSeq.sortBy(a => (a.key, a.hr_start))
    // hour 30 is the watermark flusher: the batch op scores it too
    // (25 trailing-range hours exist), the stream has not closed it
    val batchComparable = batch.filter(_.hr_start < 30L * 3600L)
    assert(streamed == batchComparable, s"\nstream: $streamed\nbatch: $batchComparable")
    assert(streamed.exists(a => a.hr_start == 24L * 3600L && a.is_anomaly))
  }

  test("an hour is scored exactly once even when its events span batches") {
    val hist = (0L until 24L).map(_ -> 10)
    val rows = hourlyEvents(hist ++ Seq(24L -> 6, 25L -> 1))
    // hour 24's six events arrive in two different batches
    val (h24a, h24b) = rows.filter(r => r._2 >= 24L * 3600L && r._2 < 25L * 3600L)
      .splitAt(3)
    val streamed = runStream(Seq(
      rows.filter(_._2 < 24L * 3600L) ++ h24a,
      h24b,
      rows.filter(_._2 >= 25L * 3600L)))
    val scored24 = streamed.filter(_.hr_start == 24L * 3600L)
    assert(scored24.length == 1)
    assert(scored24.head.n_events == 6L)
    assert(scored24.head.z_score.isEmpty && scored24.head.is_anomaly)
  }

  test("state stays bounded: old hours evict once outside every future frame") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    // drive the transition function directly with a fake GroupState
    var st: Option[Anomaly.AnomState] = None
    var removed = false
    var wmHr = 0L
    val fake = new GroupState[Anomaly.AnomState] {
      override def exists: Boolean = st.isDefined
      override def get: Anomaly.AnomState = st.get
      override def getOption: Option[Anomaly.AnomState] = st
      override def update(s: Anomaly.AnomState): Unit = { st = Some(s) }
      override def remove(): Unit = { st = None; removed = true }
      override def hasTimedOut: Boolean = false
      override def setTimeoutDuration(d: Long): Unit = ()
      override def setTimeoutDuration(d: String): Unit = ()
      override def setTimeoutTimestamp(t: Long): Unit = ()
      override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
      override def getCurrentWatermarkMs(): Long = wmHr * 3600L * 1000L
      override def getCurrentProcessingTimeMs(): Long = 0L
    }
    val events = (0L until 60L).flatMap(h =>
      Seq(Anomaly.Event("k", new java.sql.Timestamp(h * 3600L * 1000L))))
    // watermark mid-stream: hours < 50 scored, history evicted below
    // wmHr - 24, pending hours 50..59 retained
    wmHr = 50L
    Anomaly.update(24, 12, 3.0)("k", events.iterator, fake).toList
    assert(st.get.scoredUpTo == 49L)
    assert(st.get.counts.keys.min == 26L && st.get.counts.keys.max == 59L)
    // watermark far past everything: the key self-destructs entirely
    wmHr = 200L
    Anomaly.update(24, 12, 3.0)("k", Iterator.empty, fake).toList
    assert(removed && st.isEmpty)
  }
}
