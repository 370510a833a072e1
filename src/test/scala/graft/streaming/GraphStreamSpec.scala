package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.GraphStream.{CcDelta, CcState, EdgeArrival}

/** Stream == batch parity for the graph family's streaming rung:
  * incremental CC deltas over a split edge stream fold to exactly the
  * batch [[graft.operators.Dedup.connectedComponents]] labeling at
  * EVERY prefix, including a batch that bridges two existing
  * components through a brand-new node and a later batch that
  * re-points a whole component to a smaller id.
  */
class GraphStreamSpec extends graft.SparkSpec {

  private def batchCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val df = edges.toDF("id1", "id2")
    val cc = graft.operators.Dedup.connectedComponents(df)
    val out = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cc.unpersist()
    out
  }

  private def fold(deltas: Seq[CcDelta]): Map[Long, Long] =
    deltas.groupBy(_.id).map { case (id, ds) =>
      id -> ds.maxBy(_.as_of).component
    }

  test("cc deltas fold to the batch labeling at every prefix of a split edge stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val batches = Seq(
      Seq((10L, 11L), (20L, 21L), (30L, 31L)), // three components
      Seq((11L, 40L), (40L, 20L)),             // NEW node 40 bridges 10s and 20s
      Seq((50L, 51L), (31L, 5L))               // new comp + 30s re-point to 5
    )
    val input = MemoryStream[(Long, Long)]
    val q = GraphStream.ccDeltas(
        input.toDS().map { case (a, b) => EdgeArrival(a, b) })
      .writeStream.format("memory").queryName("ccdeltas")
      .outputMode(OutputMode.Append()).start()
    try {
      var prefix = Seq.empty[(Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b: _*)
        q.processAllAvailable()
        prefix = prefix ++ b
        val deltas = s.table("ccdeltas").as[CcDelta].collect().toSeq
        assert(deltas.map(_.as_of).max == i + 1, deltas.toString)
        assert(fold(deltas) == batchCc(prefix),
          s"prefix ${i + 1} diverged: ${fold(deltas)} vs ${batchCc(prefix)}")
      }
    } finally q.stop()
  }

  test("transition: a bridge through a new node merges two components to the min") {
    val st = new TestGroupState[CcState]
    st.update(CcState(1L, Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L)))
    val out = GraphStream.ccUpdate("all",
      Iterator(EdgeArrival(11L, 40L), EdgeArrival(40L, 20L)), st).toList
    // 20s re-point to 10, new 40 labels 10; the 10s are UNCHANGED and
    // must not re-emit
    assert(out.toSet == Set(CcDelta(2L, 20L, 10L), CcDelta(2L, 21L, 10L),
      CcDelta(2L, 40L, 10L)), out.toString)
    assert(st.get.comp == Map(10L -> 10L, 11L -> 10L, 20L -> 10L,
      21L -> 10L, 40L -> 10L))
  }

  test("transition: an empty batch emits nothing and leaves state untouched") {
    val st = new TestGroupState[CcState]
    st.update(CcState(3L, Map(1L -> 1L)))
    assert(GraphStream.ccUpdate("all", Iterator.empty, st).isEmpty)
    assert(st.get == CcState(3L, Map(1L -> 1L)))
  }

  test("transition: a new node smaller than an existing rep wins the min") {
    val st = new TestGroupState[CcState]
    st.update(CcState(1L, Map(10L -> 10L, 11L -> 10L)))
    val out = GraphStream.ccUpdate("all",
      Iterator(EdgeArrival(1L, 11L)), st).toList
    assert(out.toSet == Set(CcDelta(2L, 10L, 1L), CcDelta(2L, 11L, 1L),
      CcDelta(2L, 1L, 1L)))
  }
}
