package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import SessionPaths.{Ev, SessionPath}

class SessionPathsSpec extends SparkSpec {

  test("stream paths equal the batch session paths across batch boundaries") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[(String, Long, Long, String)]
    val events = input.toDF().toDF("key", "tsSec", "id", "etype")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      // the 105s event arrives AFTER the 110s one, across a batch
      // boundary — the allowance must cover that disorder, or the
      // watermark pre-filter drops it before the stateful op (the
      // repo-wide contract: later than the allowance = no session)
      .withWatermark("ts", "20 seconds")
      .select("key", "ts", "id", "etype").as[Ev]

    val q = SessionPaths.paths(events, gapUs = 30000000L, maxLen = 3)
      .writeStream.format("memory").queryName("spaths")
      .outputMode(OutputMode.Append()).start()
    val rows = Seq(
      // u1 session 1: c arrives out of order WITHIN the session,
      // and spills over a micro-batch boundary
      ("u1", 100L, 1L, "view"), ("u1", 110L, 2L, "click"),
      ("u2", 100L, 5L, "view"),
      // batch 2 (added below): u1 105s event is earlier than the
      // already-seen 110s one — the sorted head must absorb it
      ("u1", 105L, 3L, "detail"), ("u1", 120L, 4L, "buy"),
      // much later: closes everything
      ("u1", 1000L, 9L, "view"), ("u2", 1000L, 9L, "view"))
    try {
      input.addData(rows.take(3))
      q.processAllAvailable()
      input.addData(rows.slice(3, 5))
      q.processAllAvailable()
      input.addData(rows.slice(5, 7))
      q.processAllAvailable()
      // the late burst closes the first sessions; stop and drain the
      // final ones via one more watermark push
      input.addData(("u1", 2000L, 10L, "x"), ("u2", 2000L, 10L, "x"))
      q.processAllAvailable()

      val streamed = spark.table("spaths").as[SessionPath].collect()
        .map(p => (p.key, p.path)).sorted.toSeq

      val batch = graft.operators.LogMining.sessionPathStrings(
          rows.toDF("user_id", "tsSec", "event_id", "event_type")
            .withColumn("ts_us", col("tsSec") * 1000000L),
          "user_id", "ts_us", "event_id", "event_type",
          gapUs = 30000000L, maxLen = 3)
        .collect().map(r => (r.getString(0), r.getString(2))).sorted.toSeq

      // batch sees ALL sessions incl. the final (1000s, 2000s) ones
      // the stream hasn't closed yet — compare on the closed prefix
      assert(streamed.nonEmpty)
      assert(batch.containsSlice(streamed) || streamed.forall(batch.contains),
        s"stream=$streamed batch=$batch")
      // the spilled, out-of-order u1 session must have the exact
      // maxLen-truncated (ts,id)-sorted head in BOTH
      assert(streamed.contains(("u1", "view>detail>click")))
      assert(batch.contains(("u1", "view>detail>click")))
    } finally q.stop()
  }

  test("out-of-order arrivals replay the batch sorted-adjacency rule") {
    def ev(sec: Long, id: Long, t: String) =
      Ev("u", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), id, t)
    val gap = 30000000L // 30s
    // open session spans [100, 200] (events 100, 125, 155, 180, 200 —
    // each adjacent pair within the gap)
    val st = new TestGroupState[SessionPaths.PathState]
    SessionPaths.update(gap, 8)("u",
      Iterator(ev(100, 1, "a"), ev(125, 2, "b"), ev(155, 3, "c"),
        ev(180, 4, "d"), ev(200, 5, "e")), st)
    // an in-span straggler 60s from `last` (beyond the gap) still
    // joins — in global sort order it sits inside the session
    val out1 = SessionPaths.update(gap, 8)("u", Iterator(ev(140, 6, "X")), st).toList
    assert(out1.isEmpty)
    assert(st.updated.exists(_.head.map(_.etype) ==
      List("a", "b", "X", "c", "d", "e")))
    // a pre-start straggler within the gap of the start joins too
    SessionPaths.update(gap, 8)("u", Iterator(ev(75, 7, "Y")), st)
    assert(st.updated.exists(_.head.head.etype == "Y"))
    // one beyond the gap of the start closes as its own singleton
    val out2 = SessionPaths.update(gap, 8)("u", Iterator(ev(10, 8, "Z")), st).toList
    assert(out2.map(_.path) == List("Z"))
    assert(st.updated.exists(_.head.head.etype == "Y")) // state untouched
  }

  test("sub-ms co-timed events order by microseconds, matching batch") {
    // two events in the SAME millisecond, 250µs apart, with ids in the
    // OPPOSITE order of their µs timestamps: an ms-truncating tsUs
    // would tie-break by id and reverse them; the µs-accurate tsUs
    // (via toInstant) keeps event-time order
    def evUs(us: Long, id: Long, t: String) = {
      val ts = java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))
      Ev("u", ts, id, t)
    }
    val e1 = evUs(100000250L, 9L, "first")  // 100.000250s, larger id
    val e2 = evUs(100000500L, 1L, "second") // 100.000500s, smaller id
    assert(e1.tsUs == 100000250L && e2.tsUs == 100000500L)
    val state = new TestGroupState[SessionPaths.PathState]
    SessionPaths.update(30000000L, 8)("u", Iterator(e2, e1), state)
    val closed = SessionPaths.update(30000000L, 8)("u",
      Iterator(evUs(500000000L, 2L, "z")), state).toList
    assert(closed.map(_.path) == List("first>second"))
    // batch twin on the identical µs values agrees
    val s = spark; import s.implicits._
    val batch = graft.operators.LogMining.sessionPathStrings(
        Seq(("u", 100000500L, 1L, "second"), ("u", 100000250L, 9L, "first"))
          .toDF("user_id", "ts_us", "event_id", "event_type"),
        "user_id", "ts_us", "event_id", "event_type",
        gapUs = 30000000L, maxLen = 8)
      .collect().map(_.getString(2)).toList
    assert(batch == List("first>second"))
  }

  test("maxLen truncates the head; a gap inside one batch closes in place") {
    val out = collection.mutable.ListBuffer.empty[SessionPath]
    val state = new TestGroupState[SessionPaths.PathState]
    val evs = Seq(
      Ev("u", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(100)), 1L, "a"),
      Ev("u", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(101)), 2L, "b"),
      Ev("u", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(102)), 3L, "c"),
      // 1h later: same batch, new session
      Ev("u", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(4000)), 4L, "d"))
    out ++= SessionPaths.update(30000000L, 2)("u", evs.iterator, state)
    assert(out.map(p => p.path).toList == List("a>b"))
    assert(state.updated.exists(_.head.map(_.etype) == List("d")))
  }
}
