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

/** Stream == batch parity for the r16 graph rungs: incremental SSSP
  * deltas fold to converged batch Bellman-Ford at EVERY prefix of a
  * split weighted edge stream (including a batch whose new edge
  * shortens already-settled distances through OLD edges), and LPA
  * recompute-on-arrival deltas fold to the fixed-iters batch
  * labeling at every prefix.
  */
class GraphStreamWeightedSpec extends graft.SparkSpec {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.streaming.OutputMode
  import graft.streaming.GraphStream.{LpaDelta, SsspDelta, SsspState, WEdgeArrival}

  private def batchSssp(edges: Seq[(Long, Long, Long)],
                        seeds: Seq[Long]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    graft.operators.Graph.shortestPaths(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", seeds.toDF("id"), "id", maxRounds = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def batchLpa(edges: Seq[(Long, Long, Long)],
                       iters: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    graft.operators.Graph.labelPropagation(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private val batches = Seq(
    // a chain from the seed, a detached pair, a heavy direct edge
    Seq((1L, 2L, 5L), (2L, 3L, 5L), (10L, 11L, 1L), (1L, 3L, 20L)),
    // bridge into the detached pair + a SHORTCUT that must re-relax
    // the settled 3 through the OLD (2,3) edge
    Seq((3L, 10L, 2L), (1L, 2L, 1L)),
    // parallel heavier edge (ignored by min rule) + a new branch
    Seq((1L, 2L, 9L), (11L, 12L, 4L)))

  test("sssp deltas fold to converged batch Bellman-Ford at every prefix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val q = graft.streaming.GraphStream.ssspDeltas(
        input.toDS().map { case (a, b, w) => WEdgeArrival(a, b, w) },
        seeds = Set(1L))
      .writeStream.format("memory").queryName("ssspdeltas")
      .outputMode(OutputMode.Append()).start()
    try {
      var prefix = Seq.empty[(Long, Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b: _*)
        q.processAllAvailable()
        prefix = prefix ++ b
        val deltas = s.table("ssspdeltas").as[SsspDelta].collect().toSeq
        val folded = deltas.groupBy(_.id).map { case (id, ds) =>
          id -> ds.maxBy(_.as_of).dist
        }
        assert(folded == batchSssp(prefix, Seq(1L)),
          s"prefix ${i + 1}: $folded vs ${batchSssp(prefix, Seq(1L))}")
      }
    } finally q.stop()
  }

  test("lpa deltas fold to the fixed-iters batch labeling at every prefix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val q = graft.streaming.GraphStream.lpaDeltas(
        input.toDS().map { case (a, b, w) => WEdgeArrival(a, b, w) },
        iters = 3)
      .writeStream.format("memory").queryName("lpadeltas")
      .outputMode(OutputMode.Append()).start()
    try {
      var prefix = Seq.empty[(Long, Long, Long)]
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b: _*)
        q.processAllAvailable()
        prefix = prefix ++ b
        val deltas = s.table("lpadeltas").as[LpaDelta].collect().toSeq
        val folded = deltas.groupBy(_.id).map { case (id, ds) =>
          id -> ds.maxBy(_.as_of).label
        }
        assert(folded == batchLpa(prefix, 3),
          s"prefix ${i + 1}: $folded vs ${batchLpa(prefix, 3)}")
      }
    } finally q.stop()
  }

  test("sssp transition: a shortcut re-relaxes settled nodes through old edges") {
    val st = new TestGroupState[SsspState]
    st.update(SsspState(1L,
      Map(1L -> Map(2L -> 5L), 2L -> Map(3L -> 5L)),
      Map(1L -> 0L, 2L -> 5L, 3L -> 10L)))
    val out = graft.streaming.GraphStream.ssspUpdate(Set(1L))("all",
      Iterator(WEdgeArrival(1L, 2L, 1L)), st).toList
    // 2 improves to 1 and 3 must follow to 6 through the OLD (2,3,5)
    assert(out.toSet == Set(SsspDelta(2L, 2L, 1L), SsspDelta(2L, 3L, 6L)),
      out.toString)
    assert(st.get.dist == Map(1L -> 0L, 2L -> 1L, 3L -> 6L))
  }

  test("sssp transition: a heavier parallel edge changes nothing") {
    val st = new TestGroupState[SsspState]
    st.update(SsspState(1L, Map(1L -> Map(2L -> 5L)), Map(1L -> 0L, 2L -> 5L)))
    val out = graft.streaming.GraphStream.ssspUpdate(Set(1L))("all",
      Iterator(WEdgeArrival(1L, 2L, 9L)), st).toList
    assert(out.isEmpty)
    assert(st.get.adj(1L)(2L) == 5L)
  }

  test("sssp transition: negative weight is rejected loudly") {
    val st = new TestGroupState[SsspState]
    intercept[IllegalArgumentException] {
      graft.streaming.GraphStream.ssspUpdate(Set(1L))("all",
        Iterator(WEdgeArrival(1L, 2L, -1L)), st).toList
    }
  }
}
