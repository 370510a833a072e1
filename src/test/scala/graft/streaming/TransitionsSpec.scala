package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import Transitions.{Edge, Ev}

class TransitionsSpec extends SparkSpec {

  test("streamed edges equal the batch lag multiset across disorder and batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // per-user template streams with in-allowance disorder: u1's 105s
    // event arrives AFTER its 110s event and in a LATER micro-batch
    val rows = Seq(
      ("u1", 100L, 1L, "login"), ("u1", 110L, 2L, "query"),
      ("u2", 100L, 5L, "login"),
      ("u1", 105L, 3L, "browse"), ("u1", 120L, 4L, "logout"),
      ("u2", 130L, 6L, "crash"),
      ("u1", 500L, 9L, "login"), ("u2", 500L, 9L, "login"))

    val batch = {
      val w = Window.partitionBy(col("key")).orderBy(col("tsSec"), col("id"))
      rows.toDF("key", "tsSec", "id", "tpl")
        .withColumn("src", lag(col("tpl"), 1).over(w))
        .filter(col("src").isNotNull)
        .select(col("key"), col("src"), col("tpl"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
    }

    val input = MemoryStream[(String, Long, Long, String)]
    val events = input.toDF().toDF("key", "tsSec", "id", "tpl")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "20 seconds")
      .select("key", "ts", "id", "tpl").as[Ev]
    val q = Transitions.edges(events)
      .writeStream.format("memory").queryName("tedges")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(3))
      q.processAllAvailable()
      input.addData(rows.slice(3, 6))
      q.processAllAvailable()
      input.addData(rows.slice(6, 8))
      q.processAllAvailable()
      // push the watermark far past everything so every edge finalizes
      input.addData(("u3", 9000L, 99L, "x"))
      q.processAllAvailable()
      input.addData(("u3", 9500L, 100L, "y"))
      q.processAllAvailable()

      val streamed = s.table("tedges").as[Edge].collect()
        .map(e => (e.key, e.src_template, e.dst_template))
        .groupBy(identity).view.mapValues(_.size).toMap
      // the streamed multiset must contain every batch edge for the
      // fully-finalized keys; nothing extra, nothing doubled
      assert(streamed == batch,
        s"missing=${batch.toSet -- streamed.toSet} extra=${streamed.toSet -- batch.toSet}")
      // the disordered arrival really did sort into place
      assert(streamed.contains(("u1", "browse", "query")))
    } finally q.stop()
  }

  test("unit: boundary chaining across flushes; no edge from a single event") {
    def ev(sec: Long, id: Long, t: String) =
      Ev("k", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), id, t)
    val st = new TestGroupState[Transitions.TState]
    // watermark 0: nothing ripe, nothing emitted
    assert(Transitions.update("k", Iterator(ev(100, 1, "a")), st).isEmpty)
    assert(st.updated.exists(_.buf.nonEmpty))
    // watermark passes 100: 'a' finalizes alone — no pair yet
    st.watermarkMs = 101000L
    assert(Transitions.update("k", Iterator.empty, st).isEmpty)
    assert(st.updated.exists(s => s.last.exists(_.tpl == "a") && s.buf.isEmpty))
    // 'b' arrives and ripens: the edge chains through the boundary
    st.watermarkMs = 201000L
    val out = Transitions.update("k", Iterator(ev(200, 2, "b")), st).toList
    assert(out.map(e => (e.src_template, e.dst_template)) == List(("a", "b")))
  }
}
