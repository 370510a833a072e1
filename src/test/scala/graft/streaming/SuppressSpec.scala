package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows
import Suppress.Alert

/** r34's streaming twin: the kept set must be bit-identical to the
  * batch `Windows.suppressAlerts` pass over any in-order micro-batch
  * split — including a split INSIDE a suppression window, where the
  * survivor anchor must cross the batch boundary in state.
  */
class SuppressSpec extends SparkSpec {

  private val M = 60L * 1000000L // one minute in micros

  // two keys; key 1 exercises survivor-vs-event feedback (the 0/30/70
  // case) plus a post-window alert; key 2 is an instant-tie pair
  private val history = Seq(
    Alert(1L, 0L * M, 10L), Alert(1L, 30L * M, 11L), Alert(1L, 70L * M, 12L),
    Alert(1L, 140L * M, 13L), Alert(2L, 0L, 21L), Alert(2L, 0L, 20L))

  private def batchKept(alerts: Seq[Alert]): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    Windows.suppressAlerts(alerts.toDF("k", "ts", "id"),
        "k", "ts", "id", suppressSec = 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
  }

  test("stream kept set equals batch across a mid-window batch boundary") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Alert]
    val q = Suppress.kept(input.toDS(), suppressSec = 3600L)
      .writeStream.format("memory").queryName("skept")
      .outputMode(OutputMode.Append()).start()
    try {
      // split between t=30 (suppressed) and t=70 (kept): the t=0
      // survivor anchor must survive the boundary or t=70 re-anchors
      // wrong; key 2's tie pair also splits across batches in id order
      val (b1, b2) = (Seq(history(0), history(1), history(5)),
        Seq(history(2), history(3), history(4)))
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = spark.table("skept").as[Alert].collect()
        .map(a => (a.key, a.tsUs, a.id)).sortBy(identity).toSeq
      assert(got == batchKept(history), s"stream=$got batch=${batchKept(history)}")
      // non-vacuous: t=30 suppressed, t=70 kept (survivor-not-event)
      assert(got.map(_._3).toSet == Set(10L, 12L, 13L, 20L))
    } finally q.stop()
  }

  test("replays are ignored, never re-decided; within-batch order is sorted") {
    val st = new TestGroupState[Suppress.SuppressState]
    val up = Suppress.update(3600L * 1000000L) _
    // out-of-order WITHIN one batch: sorted before deciding
    assert(up(1L, Iterator(Alert(1L, 30L * M, 11L), Alert(1L, 0L, 10L)), st)
      .map(_.id).toList == List(10L))
    // replay of the suppressed t=30 alert: ignored (no double-decide)
    assert(up(1L, Iterator(Alert(1L, 30L * M, 11L)), st).isEmpty)
    // t=70 keeps — measured from the t=0 SURVIVOR carried in state
    assert(up(1L, Iterator(Alert(1L, 70L * M, 12L)), st)
      .map(_.id).toList == List(12L))
  }
}
