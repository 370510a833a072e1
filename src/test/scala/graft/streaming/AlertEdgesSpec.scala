package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import AlertEdges.{Edge, Verdict}

class AlertEdgesSpec extends SparkSpec {

  // one key's verdict history: 2 quiet, 3 anomalous, 1 quiet, 1 anomalous
  private val history = Seq(
    (0L, false), (1L, false), (2L, true), (3L, true), (4L, true),
    (5L, false), (6L, true))

  private def batchEdges(vs: Seq[(Long, Boolean)]): Seq[(Long, String)] =
    vs.sortBy(_._1).foldLeft((Seq.empty[(Long, String)], false)) {
      case ((acc, prev), (hr, an)) =>
        (if (an != prev) acc :+ (hr, if (an) "fire" else "resolve") else acc, an)
    }._1

  test("stream edges equal the batch lag rule across micro-batch boundaries") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(String, Long, Boolean)]
    val verdicts = input.toDF().toDF("key", "hrStart", "isAnomaly").as[Verdict]
    val q = AlertEdges.edges(verdicts)
      .writeStream.format("memory").queryName("aedges")
      .outputMode(OutputMode.Append()).start()
    try {
      // split the history mid-incident so the suppression state must
      // survive a batch boundary
      input.addData(history.take(3).map { case (h, a) => ("k", h, a) })
      q.processAllAvailable()
      input.addData(history.drop(3).map { case (h, a) => ("k", h, a) })
      q.processAllAvailable()
      val got = spark.table("aedges").as[Edge].collect()
        .map(e => (e.hrStart, e.edge)).sortBy(_._1).toSeq
      assert(got == batchEdges(history),
        s"stream=$got batch=${batchEdges(history)}")
      // the 3-hour incident paged exactly once; the final open
      // incident has fired but not yet resolved
      assert(got.count(_._2 == "fire") == 2 && got.count(_._2 == "resolve") == 1)
    } finally q.stop()
  }

  test("first scored hour fires only if anomalous; stale replays are ignored") {
    val st = new TestGroupState[AlertEdges.LastVerdict]
    // quiet first hour: no emission, state primed
    assert(AlertEdges.update("k",
      Iterator(Verdict("k", 10L, false)), st).isEmpty)
    // replayed hour 10 with a flipped verdict must NOT re-fire
    assert(AlertEdges.update("k",
      Iterator(Verdict("k", 10L, true)), st).isEmpty)
    // a genuinely new anomalous hour fires
    val out = AlertEdges.update("k",
      Iterator(Verdict("k", 11L, true)), st).toList
    assert(out.map(_.edge) == List("fire"))
    // an anomalous FIRST hour on a fresh key fires immediately
    val st2 = new TestGroupState[AlertEdges.LastVerdict]
    assert(AlertEdges.update("k2",
      Iterator(Verdict("k2", 0L, true)), st2).toList.map(_.edge) == List("fire"))
  }
}
