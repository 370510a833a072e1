package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows
import Anomaly.Event
import Ewma.Forecast

/** Streaming EWMA rate forecast (the r20 batch op live). */
class EwmaSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[(String, Long)]]): Seq[Forecast] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, Long)]
    val events = input.toDF().toDF("key", "tsSec")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .select("key", "ts").as[Event]
    val name = s"ewma_${System.nanoTime()}"
    val q = Ewma.forecasts(events)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Forecast].collect().toSeq
        .sortBy(f => (f.key, f.hr_start))
    } finally q.stop()
  }

  private def hourlyEvents(counts: Seq[(Long, Int)], key: String = "click") =
    counts.flatMap { case (hr, n) =>
      (1 to n).map(i => (key, hr * 3600L + i))
    }

  test("stream forecasts bit-match the batch operator across batch boundaries") {
    // varied history, a spike, a drop, then a flush hour
    val hist = (0L until 24L).map(h => h -> (6 + (h % 5)).toInt)
    val all = hist ++ Seq(24L -> 60, 25L -> 1, 26L -> 8, 40L -> 1)
    val rows = hourlyEvents(all)
    val streamed = runStream(Seq(
      rows.filter(_._2 < 10L * 3600L),
      rows.filter(r => r._2 >= 10L * 3600L && r._2 < 25L * 3600L),
      rows.filter(_._2 >= 25L * 3600L)))
    val s = spark
    import s.implicits._
    val batch = Windows.ewmaForecast(
        rows.toDF("event_type", "epoch")
          .withColumn("ts", timestamp_seconds(col("epoch"))),
        "ts", "event_type")
      .collect().map(r => Forecast(r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4), r.getBoolean(5)))
      .toSeq.sortBy(f => (f.key, f.hr_start))
    // hour 40 is the watermark flusher; its own trailing frame holds
    // 11 present hours (16..26) < minHistory, so neither side scores
    // it — compare everything the stream has closed anyway
    val batchComparable = batch.filter(_.hr_start < 40L * 3600L)
    assert(streamed == batchComparable,
      s"\nstream: $streamed\nbatch: $batchComparable")
    // the spike hour flagged, the drop hour flagged
    assert(streamed.exists(f => f.hr_start == 24L * 3600L && f.is_spike))
    assert(streamed.exists(f => f.hr_start == 25L * 3600L && f.is_drop))
  }

  test("scorer: dyadic weights, renormalized gaps, thin history unscored") {
    // direct unit test of the scorer arithmetic (no stream harness)
    val counts = (0L until 12L).map(_ -> 10L).toMap + (24L -> 2L)
    val got = Ewma.score("k", 24L, counts, 24, 12, 3.0)
    assert(got.contains(Forecast("k", 24L * 3600L, 2L, 10.0, false, true)))
    assert(Ewma.score("k", 24L, counts, 24, 13, 3.0).isEmpty)
  }
}
