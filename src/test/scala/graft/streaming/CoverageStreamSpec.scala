package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows
import CoverageStream._

/** Streaming twin of the q33 interval-union coverage: every emitted
  * frame bit-equal to the batch sweep over the key's prefix, across
  * micro-batch boundaries; merge/fold unit cases.
  */
class CoverageStreamSpec extends SparkSpec {

  test("merge fuses at the half-open boundary and across overlaps") {
    assert(merge(Nil, 10L, 20L) == List((10L, 20L)))
    // back-to-back fuses (the q33 half-open rule)
    assert(merge(List((10L, 20L)), 20L, 30L) == List((10L, 30L)))
    // strict gap stays split
    assert(merge(List((10L, 20L)), 21L, 30L) == List((10L, 20L), (21L, 30L)))
    // an interval swallowing two others collapses all three
    assert(merge(List((10L, 20L), (30L, 40L), (50L, 60L)), 15L, 55L) ==
      List((10L, 60L)))
    // insert before everything, no touch
    assert(merge(List((10L, 20L)), 1L, 5L) == List((1L, 5L), (10L, 20L)))
  }

  // user A: overlapping bursts then a gap; user B: sparse singletons
  private def covEvents(): Seq[(String, Long)] =
    Seq(
      ("a", 100L), ("a", 1000L), ("a", 1500L),   // overlaps (dur 1800)
      ("a", 10000L),                              // gap then new island
      ("b", 500L),
      ("a", 20000L), ("b", 30000L),
      ("a", 20500L), ("a", 47000L), ("b", 52000L))

  private def batchAt(rows: Seq[(String, Long)], key: String,
                      anchorUs: Long, durSec: Long): CovRow = {
    val s = spark
    import s.implicits._
    val r = Windows.intervalCoverage(
        rows.filter(x => x._1 == key && x._2 * 1000000L <= anchorUs)
          .toDF("user", "epoch")
          .withColumn("ts", timestamp_seconds(col("epoch"))),
        "ts", "user", durSec)
      .collect().head
    CovRow(key, anchorUs, r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4))
  }

  test("coverage frames equal the batch sweep at every emitted anchor") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = covEvents()
    val input = MemoryStream[(String, Long)]
    val events = input.toDF().toDF("key", "tsSec")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .select("key", "ts").as[KeyEvent]
    val q = coverageFrames(events, durSec = 1800L)
      .writeStream.format("memory").queryName("cov")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.filter(_._2 < 15000L): _*)
      q.processAllAvailable()
      input.addData(rows.filter(r => r._2 >= 15000L && r._2 < 40000L): _*)
      q.processAllAvailable()
      // flusher far past everything closes the tail
      input.addData(rows.filter(_._2 >= 40000L) :+ ("a", 99000L): _*)
      q.processAllAvailable()
      val got = spark.table("cov").as[CovRow].collect().toSeq
      assert(got.nonEmpty)
      got.foreach { f =>
        assert(f == batchAt(rows :+ ("a", 99000L), f.key, f.as_of, 1800L),
          s"frame $f vs batch ${batchAt(rows :+ ("a", 99000L), f.key, f.as_of, 1800L)}")
      }
      // the final frame per key covers every event of that key
      val lastA = got.filter(_.key == "a").maxBy(_.as_of)
      assert(lastA.n_intervals == 7L, lastA.toString)
    } finally q.stop()
  }

  test("closed intervals fold out of state") {
    val st = new TestGroupState[CovState]
    st.watermarkMs = 100000L * 1000L // far past everything
    val evs = Seq(100L, 1000L, 50000L).map(sec =>
      SloMonitor.KeyEvent("a", new java.sql.Timestamp(sec * 1000L)))
    val out = covUpdate(1800L)("a", evs.iterator, st).toList
    assert(out.length == 1, out.toString)
    // both islands closed: open list empty, covered folded
    val s1 = st.updated.get
    assert(s1.open.isEmpty && s1.pending.isEmpty, s1.toString)
    assert(s1.coveredClosed == (2700L + 1800L) * 1000000L, s1.toString)
    assert(out.head.covered_micros == s1.coveredClosed, out.toString)
  }
}
