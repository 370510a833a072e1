package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows
import Scd2Stream._

/** Streaming twin of the q34 SCD2 build: every emitted closed version
  * bit-equal to the batch chain's closed rows over the closed prefix,
  * across micro-batch boundaries; collapse and ordering unit cases.
  */
class Scd2StreamSpec extends SparkSpec {

  // key 1: a->a->b->b->a (collapses to a,b,a); key 2: x->y
  private def scdEvents(): Seq[(Long, String, Long, Long)] =
    Seq(
      (1L, "a", 100L, 1L), (1L, "a", 200L, 2L), (1L, "b", 300L, 3L),
      (2L, "x", 150L, 4L),
      (1L, "b", 400L, 5L), (1L, "a", 500L, 6L),
      (2L, "y", 600L, 7L))

  test("closed versions equal the batch chain's closed rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = scdEvents()
    val input = MemoryStream[(Long, String, Long, Long)]
    val events = input.toDF().toDF("key", "state", "tsSec", "tie")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .select("key", "state", "ts", "tie").as[ScdEvent]
    val q = scd2Versions(events)
      .writeStream.format("memory").queryName("scd")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.filter(_._3 < 350L): _*)
      q.processAllAvailable()
      input.addData(rows.filter(r => r._3 >= 350L && r._3 < 550L): _*)
      q.processAllAvailable()
      // two flusher changes plus a watermark advancer: the zz change
      // closes version 3, zz2 closes zz, and the 10000 advancer (same
      // state — collapses) pushes the watermark past both
      val flushers = Seq((1L, "zz", 9000L, 99L), (1L, "zz2", 9500L, 100L),
        (1L, "zz2", 10000L, 101L))
      input.addData(rows.filter(_._3 >= 550L) ++ flushers: _*)
      q.processAllAvailable()
      val got = spark.table("scd").as[ScdRow].collect().toSeq
        .map(r => (r.key, r.state, r.effective_from, r.effective_to, r.version))
        .sorted
      // batch over the CLOSED prefix (events below the final 10000
      // watermark), closed rows only — the open zz2 version is state
      val allRows = rows ++ flushers.take(2)
      val batch = Windows.scd2(
          allRows.toDF("key", "state", "tsSec", "tie")
            .withColumn("_us", col("tsSec") * 1000000L),
          "key", "state", "_us", "tie")
        .filter(col("effective_to").isNotNull)
        .collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sorted
      assert(got == batch, s"\nstream: $got\nbatch:  $batch")
      // the collapse happened: key 1 closed versions 1(a),2(b),3(a),4(zz)
      assert(got.count(_._1 == 1L) == 4, got.toString)
    } finally q.stop()
  }

  test("transition: repeats collapse, the open version never emits") {
    val st = new TestGroupState[ScdState]
    st.watermarkMs = 1000L * 1000L
    def ev(s: String, sec: Long, t: Long) =
      ScdEvent(1L, s, new java.sql.Timestamp(sec * 1000L), t)
    val out = scdUpdate(1L,
      Iterator(ev("a", 10L, 1L), ev("a", 20L, 2L), ev("b", 30L, 3L)), st).toList
    assert(out == List(ScdRow(1L, "a", 10L * 1000000L, 30L * 1000000L, 1L)),
      out.toString)
    val s1 = st.updated.get
    assert(s1.openState == "b" && s1.version == 2L && s1.pending.isEmpty, s1)
    // a later repeat of the open state is a no-op
    val st2 = new TestGroupState[ScdState]
    st2.watermarkMs = 2000L * 1000L
    st2.updated = Some(s1)
    val out2 = scdUpdate(1L, Iterator(ev("b", 1500L, 4L)), st2).toList
    assert(out2.isEmpty && st2.updated.get.version == 2L, out2.toString)
  }
}
