package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows
import SloMonitor._

/** Streaming twin of the r30 CUSUM chart: every emitted row must be
  * bit-equal to the batch operator over the stream's closed prefix,
  * across micro-batch boundaries, including a drift that signals
  * mid-stream.
  */
class CusumStreamSpec extends SparkSpec {

  // key "a" drifts 80% after its 24h warmup (dev +5.5e6/hour crosses
  // the 5x-baseline threshold after ~10 drift hours); key "b" flat
  private def events(hours: Range): Seq[(String, Long)] =
    hours.flatMap { h =>
      val na = if (h < 24) 10 else 18
      val nb = 10 + (h % 2)
      (1 to na).map(i => ("a", h * 3600L + i)) ++
        (1 to nb).map(i => ("b", h * 3600L + i))
    }

  private def batchRows(rows: Seq[(String, Long)], belowHr: Long): Seq[CusumRow] = {
    val s = spark
    import s.implicits._
    Windows.cusumChangepoint(
        rows.filter(_._2 < belowHr * 3600L).toDF("key", "epoch")
          .withColumn("ts", timestamp_seconds(col("epoch"))),
        "ts", "key")
      .collect().map(r => CusumRow(r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toSeq.sortBy(r => (r.key, r.hr_start))
  }

  test("stream rows equal the batch chart over the closed prefix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = events(0 until 80)
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("key", "tsSec")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .select("key", "ts").as[KeyEvent]
    val q = cusumFrames(stream)
      .writeStream.format("memory").queryName("cusum")
      .outputMode(OutputMode.Append()).start()
    try {
      // three uneven batches split mid-warmup and mid-drift, then a
      // quiet flusher hour closes everything through hour 79
      input.addData(rows.filter(_._2 < 17L * 3600L): _*)
      q.processAllAvailable()
      input.addData(rows.filter(r => r._2 >= 17L * 3600L && r._2 < 50L * 3600L): _*)
      q.processAllAvailable()
      input.addData(rows.filter(_._2 >= 50L * 3600L) :+ (("a", 81L * 3600L + 1L)): _*)
      q.processAllAvailable()
      val got = s.table("cusum").as[CusumRow].collect().toSeq
        .sortBy(r => (r.key, r.hr_start))
      // closed prefix = hours < 80 for both keys (the flusher hour 81
      // pushes the watermark past 79); the flusher event itself is
      // NOT closed, so compare against batch over hours < 80
      val want = batchRows(rows, 80L)
      assert(got == want,
        s"stream: ${got.take(5)}... (${got.length})\nbatch: ${want.take(5)}... (${want.length})")
      // CUSUM rows are prefix-final: emitted per-hour rows never
      // change as later hours arrive, so the full-run equality above
      // IS the every-prefix claim; sanity-check the drift signalled
      assert(got.exists(r => r.key == "a" && r.is_change))
      assert(!got.exists(r => r.key == "b" && r.is_change))
    } finally q.stop()
  }

  test("the transition scores closed hours in order and holds warmup") {
    val st = new TestGroupState[CusumState]
    // 25 present hours of 10 events for key k, watermark past hour 24:
    // hour 24 scores against a baseline of exactly 10
    val evs = (0L until 25L).flatMap(h =>
      (1 to 10).map(i => KeyEvent("k", new java.sql.Timestamp((h * 3600L + i) * 1000L))))
    st.watermarkMs = 25L * 3600L * 1000L
    val out = cusumUpdate(24, 4, 5)("k", evs.iterator, st).toSeq
    assert(out.length == 1, out)
    val r = out.head
    assert(r.hr_start == 24L * 3600L && r.n_events == 10L
      && r.baseline_micros == 10000000L, r)
    // dev = 10e6 - 12.5e6 = -2.5e6, clamps to 0
    assert(r.cusum_micros == 0L && !r.is_change, r)
    // warmup map holds exactly the 24 baseline hours
    assert(st.get.base.size == 24 && st.get.pending.isEmpty)
  }

  test("bad params fail loudly") {
    val s = spark
    import s.implicits._
    val ds = s.emptyDataset[KeyEvent]
    intercept[IllegalArgumentException] { cusumFrames(ds, warmupHours = 0) }
    intercept[IllegalArgumentException] { cusumFrames(ds, slackDen = 0) }
  }
}
