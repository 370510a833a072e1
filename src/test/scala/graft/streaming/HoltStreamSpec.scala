package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows
import Anomaly.Event
import Holt.Forecast

/** Streaming Holt forecast (the r39 batch op live). */
class HoltStreamSpec extends SparkSpec {

  private def runStream(batches: Seq[Seq[(String, Long)]]): Seq[Forecast] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(String, Long)]
    val events = input.toDF().toDF("key", "tsSec")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .select("key", "ts").as[Event]
    val name = s"holt_${System.nanoTime()}"
    val q = Holt.forecasts(events)
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
    // ramp history with a GAP (zero-fill parity), a spike, then a
    // flush hour far enough out to close everything before it
    val hist = (0L until 20L).filter(_ != 13L).map(h => h -> (4 + (h % 7)).toInt)
    val all = hist ++ Seq(20L -> 50, 21L -> 6, 40L -> 1)
    val rows = hourlyEvents(all)
    val streamed = runStream(Seq(
      rows.filter(_._2 < 9L * 3600L),
      rows.filter(r => r._2 >= 9L * 3600L && r._2 < 21L * 3600L),
      rows.filter(_._2 >= 21L * 3600L)))
    val s = spark
    import s.implicits._
    val batch = Windows.holtForecast(
        rows.toDF("event_type", "epoch")
          .withColumn("ts", timestamp_seconds(col("epoch"))),
        "ts", "event_type")
      .collect().map(r => Forecast(r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6)))
      .toSeq.sortBy(f => (f.key, f.hr_start))
    // hour 40 never closes (nothing passes its watermark); everything
    // the stream closed must bit-match batch
    val batchComparable = batch.filter(_.hr_start < 40L * 3600L)
    assert(streamed == batchComparable,
      s"\nstream: $streamed\nbatch: $batchComparable")
    assert(streamed.exists(f => f.hr_start == 20L * 3600L && f.is_spike))
  }

  test("scorer: span gate, zero-fill, all-zero window unscored") {
    val counts = Map(0L -> 5L, 20L -> 7L)
    // span gate: hour 10 < firstHr + 16
    assert(Holt.score("k", 10L, counts, 0L, 16, 3.0).isEmpty)
    // hour 20 scores from y = hours 4..19 (all zero but none present
    // ... hour 4 absent -> all-zero window -> unscored)
    assert(Holt.score("k", 20L, counts, 0L, 16, 3.0).isEmpty)
    // hour 16 scores from y = hours 0..15: y0 = 5, rest zero-filled
    val got = Holt.score("k", 16L, Map(0L -> 5L, 16L -> 2L), 0L, 16, 3.0)
    assert(got.nonEmpty)
    val (lc, bc, s) = Windows.holtCoeffs(16)
    val expF = ((lc(0) + bc(0)) * 5).toDouble / math.pow(2.0, s)
    assert(got.get.holt_forecast ==
      BigDecimal(expF).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
