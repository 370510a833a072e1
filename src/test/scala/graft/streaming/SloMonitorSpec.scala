package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Windows
import SloMonitor._

/** Streaming twins of the r26/r27/r28 SRE frames: every emitted frame
  * must be BIT-equal to its batch operator run over the stream prefix
  * the frame summarizes, across micro-batch boundaries.
  */
class SloMonitorSpec extends SparkSpec {

  // ------------------------------------------------------------ r26 burn

  // hour h carries 10+(h%3) events, h%4 of them errors
  private def burnEvents(hours: Range): Seq[(Long, Boolean)] =
    hours.flatMap { h =>
      val n = 10 + (h % 3); val e = h % 4
      (1 to n).map(i => (h * 3600L + i, i <= e))
    }

  private def batchBurnAt(rows: Seq[(Long, Boolean)], anchorHr: Long,
                          wins: Seq[Int]): Seq[BurnFrame] = {
    val s = spark
    import s.implicits._
    Windows.burnRate(
        rows.filter(_._1 < (anchorHr + 1) * 3600L)
          .toDF("epoch", "isError")
          .withColumn("ts", timestamp_seconds(col("epoch"))),
        "ts", col("isError"), slo = 0.995, windowsHours = wins)
      .collect().map(r => BurnFrame(anchorHr * 3600L, r.getInt(0), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toSeq.sortBy(_.window_hours)
  }

  test("burn frames equal the batch multiwindow op at every emitted anchor") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val wins = Seq(1, 6, 24, 72)
    val rows = burnEvents(0 until 30)
    val input = MemoryStream[(Long, Boolean)]
    val events = input.toDF().toDF("tsSec", "isError")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .select("ts", "isError").as[ErrEvent]
    val q = burnFrames(events, slo = 0.995, windowsHours = wins)
      .writeStream.format("memory").queryName("burn")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.filter(_._1 < 10L * 3600L): _*)
      q.processAllAvailable()
      input.addData(rows.filter(r => r._1 >= 10L * 3600L && r._1 < 20L * 3600L): _*)
      q.processAllAvailable()
      // quiet flusher hour 31 closes everything through hour 29
      input.addData(rows.filter(_._1 >= 20L * 3600L) :+ (31L * 3600L + 1L, false): _*)
      q.processAllAvailable()
      val got = spark.table("burn").as[BurnFrame].collect().toSeq
      // EVERY emitted frame — intermediate anchors included — must
      // equal the batch op over that anchor's prefix
      val anchors = got.map(_.as_of / 3600L).distinct.sorted
      assert(anchors.nonEmpty && anchors.last == 29L, anchors.toString)
      anchors.foreach { a =>
        val frame = got.filter(_.as_of == a * 3600L).sortBy(_.window_hours)
        assert(frame == batchBurnAt(rows, a, wins),
          s"anchor $a:\nstream: $frame\nbatch: ${batchBurnAt(rows, a, wins)}")
      }
    } finally q.stop()
  }

  test("burn pages at the canonical 14.4x fast-burn threshold") {
    val st = new TestGroupState[BurnState]
    // 24 clean hours then an hour burning 10% errors against a 0.5%
    // budget = burn 20 — the 1h window pages, the 24h window does not
    val clean = (0L until 25L).flatMap(h =>
      (1 to 100).map(i => ErrEvent(new java.sql.Timestamp((h * 3600L + i) * 1000L),
        i <= (if (h == 24L) 10 else 0))))
    st.watermarkMs = 26L * 3600L * 1000L
    val frames = burnUpdate(0.995, Seq(1, 24), 14.4)(
      "all", clean.iterator, st).toList
    val f1 = frames.find(_.window_hours == 1).get
    val f24 = frames.find(_.window_hours == 24).get
    assert(f1.burn_rate == 20.0 && f1.page, f1.toString)
    assert(!f24.page, f24.toString)
    // state kept only the trailing-window hours
    assert(st.updated.get.hours.keys.min >= 26L - 24L - 1L)
  }

  // ----------------------------------------------------- r31 budget status

  private def batchBudgetAt(rows: Seq[(Long, Boolean)], anchorHr: Long,
                            period: Int, recent: Int): BudgetFrame = {
    val s = spark
    import s.implicits._
    val r = Windows.budgetStatus(
        rows.filter(_._1 < (anchorHr + 1) * 3600L)
          .toDF("epoch", "isError")
          .withColumn("ts", timestamp_seconds(col("epoch"))),
        "ts", col("isError"), slo = 0.995,
        periodHours = period, recentHours = recent)
      .collect().head
    BudgetFrame(anchorHr * 3600L, r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
      if (r.isNullAt(7)) None else Some(r.getDouble(7)), r.getBoolean(8))
  }

  test("budget frames equal the batch status report at every emitted anchor") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // 30 hours at a varying error mix; period 24 / recent 6 so both
    // the elapsed clamp and eviction engage inside the test horizon
    val rows = burnEvents(0 until 30)
    val input = MemoryStream[(Long, Boolean)]
    val events = input.toDF().toDF("tsSec", "isError")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .select("ts", "isError").as[ErrEvent]
    val q = budgetFrames(events, slo = 0.995, periodHours = 24, recentHours = 6)
      .writeStream.format("memory").queryName("budget")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.filter(_._1 < 10L * 3600L): _*)
      q.processAllAvailable()
      input.addData(rows.filter(r => r._1 >= 10L * 3600L && r._1 < 20L * 3600L): _*)
      q.processAllAvailable()
      input.addData(rows.filter(_._1 >= 20L * 3600L) :+ (31L * 3600L + 1L, false): _*)
      q.processAllAvailable()
      val got = spark.table("budget").as[BudgetFrame].collect().toSeq
      val anchors = got.map(_.as_of / 3600L).distinct.sorted
      assert(anchors.nonEmpty && anchors.last == 29L, anchors.toString)
      anchors.foreach { a =>
        val frame = got.filter(_.as_of == a * 3600L)
        assert(frame.length == 1 &&
          frame.head == batchBudgetAt(rows, a, 24, 6),
          s"anchor $a:\nstream: $frame\nbatch: ${batchBudgetAt(rows, a, 24, 6)}")
      }
    } finally q.stop()
  }

  test("budget transition: clean recent window yields no projection, state evicts") {
    val st = new TestGroupState[BudgetState]
    // errors only in hour 0; recent window (6h before anchor 29) clean
    val evs = (0L until 30L).flatMap(h =>
      (1 to 10).map(i => ErrEvent(
        new java.sql.Timestamp((h * 3600L + i) * 1000L), h == 0L && i <= 2)))
    st.watermarkMs = 30L * 3600L * 1000L
    val frames = budgetUpdate(0.995, 48, 6)("all", evs.iterator, st).toList
    assert(frames.length == 1, frames.toString)
    val f = frames.head
    assert(f.n_total == 300L && f.n_errors == 2L && f.elapsed_hours == 30L, f)
    assert(f.recent_burn == 0.0 && f.hours_to_exhaustion.isEmpty, f)
    assert(!f.exhausted, f)
    // h0 survives even when its hour would evict under a short period
    val st2 = new TestGroupState[BudgetState]
    st2.watermarkMs = 30L * 3600L * 1000L
    val f2 = budgetUpdate(0.995, 4, 2)("all", evs.iterator, st2).toList.head
    assert(f2.elapsed_hours == 4L && st2.updated.get.h0 == 0L, f2)
    assert(st2.updated.get.hours.keys.min > 29L - 4L, st2.updated.toString)
  }

  // ------------------------------------------------------------ r32 canary

  // two keys whose mix shifts over time: "api" fades, "db" grows
  private def canaryEvents(hours: Range): Seq[(String, Long)] =
    hours.flatMap { h =>
      val api = 12 - (h / 4)
      val db = 2 + (h / 3)
      (1 to (api max 1)).map(i => ("api", h * 3600L + i)) ++
        (1 to db).map(i => ("db", h * 3600L + 100 + i))
    }

  private def batchCanaryAt(rows: Seq[(String, Long)], anchorHr: Long,
                            b: Int, a: Int): Seq[CanaryRow] = {
    val s = spark
    import s.implicits._
    Windows.canaryCompare(
        rows.filter(_._2 < (anchorHr + 1) * 3600L)
          .toDF("key", "epoch")
          .withColumn("ts", timestamp_seconds(col("epoch"))),
        "ts", "key", beforeHours = b, afterHours = a)
      .collect().map(r => CanaryRow(anchorHr * 3600L, r.getString(0),
        r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getDouble(6), r.getDouble(7),
        if (r.isNullAt(8)) None else Some(r.getDouble(8))))
      .toSeq.sortBy(_.key)
  }

  test("canary frames equal the batch comparison at every emitted anchor") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = canaryEvents(0 until 30)
    val input = MemoryStream[(String, Long)]
    val events = input.toDF().toDF("key", "tsSec")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .select("key", "ts").as[KeyEvent]
    val q = canaryFrames(events, beforeHours = 12, afterHours = 4)
      .writeStream.format("memory").queryName("canary")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.filter(_._2 < 11L * 3600L): _*)
      q.processAllAvailable()
      input.addData(rows.filter(r => r._2 >= 11L * 3600L && r._2 < 21L * 3600L): _*)
      q.processAllAvailable()
      input.addData(rows.filter(_._2 >= 21L * 3600L) :+ ("api", 31L * 3600L + 1L): _*)
      q.processAllAvailable()
      val got = spark.table("canary").as[CanaryRow].collect().toSeq
      val anchors = got.map(_.as_of / 3600L).distinct.sorted
      assert(anchors.nonEmpty && anchors.last == 29L, anchors.toString)
      anchors.foreach { a =>
        val frame = got.filter(_.as_of == a * 3600L).sortBy(_.key)
        assert(frame == batchCanaryAt(rows, a, 12, 4),
          s"anchor $a:\nstream: $frame\nbatch: ${batchCanaryAt(rows, a, 12, 4)}")
      }
    } finally q.stop()
  }

  // -------------------------------------------------------- r27 seasonal

  // two keys with different weekly shapes over 2.5 weeks
  private def seasonEvents(maxHr: Long): Seq[(String, Long)] =
    (0L to maxHr).flatMap { h =>
      val a = if (h % 7L < 3L) (1 to (1 + (h % 2L).toInt)).map(i =>
        ("api", h * 3600L + i)) else Nil
      val b = if (h % 5L == 0L) Seq(("db", h * 3600L + 50L)) else Nil
      a ++ b
    }

  test("seasonal frames equal the batch hour-of-week baseline at the anchor") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = seasonEvents(420L)
    val input = MemoryStream[(String, Long)]
    val events = input.toDF().toDF("key", "tsSec")
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "0 seconds")
      .select("key", "ts").as[KeyEvent]
    val q = seasonalFrames(events)
      .writeStream.format("memory").queryName("season")
      .outputMode(OutputMode.Append()).start()
    try {
      // split mid-week so the fold-into-history crosses batch bounds
      input.addData(rows.filter(_._2 < 200L * 3600L): _*)
      q.processAllAvailable()
      input.addData(rows.filter(_._2 >= 200L * 3600L): _*)
      q.processAllAvailable()
      // quiet flusher closes hour 420
      input.addData(("flush", 423L * 3600L))
      q.processAllAvailable()
      val got = spark.table("season").as[SeasonRow].collect().toSeq
      val lastAnchor = got.map(_.as_of).max
      assert(lastAnchor == 420L * 3600L, s"anchor $lastAnchor")
      val frame = got.filter(_.as_of == lastAnchor)
        .map(r => (r.key, r.how, r.n_hist, r.slots_hist, r.baseline_mean,
          r.n_last, r.ratio))
        .sortBy(t => (t._1, t._2))
      val batch = Windows.seasonalBaseline(
          rows.toDF("event_type", "epoch")
            .withColumn("ts", timestamp_seconds(col("epoch"))),
          "ts", "event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getLong(5), if (r.isNullAt(6)) None else Some(r.getDouble(6))))
        .toSeq.sortBy(t => (t._1, t._2))
      assert(frame.size == batch.size, s"${frame.size} vs ${batch.size}")
      frame.zip(batch).foreach { case (g, b) => assert(g == b, s"\n$g\n$b") }
    } finally q.stop()
  }

  test("seasonal sub-week corpus: empty history, null baseline, no phantom slots") {
    val st = new TestGroupState[SeasonState]
    val evs = (0L until 10L).map(h =>
      KeyEvent("k", new java.sql.Timestamp(h * 3600L * 1000L)))
    st.watermarkMs = 12L * 3600L * 1000L
    val rows = seasonUpdate("all", evs.iterator, st).toList
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.slots_hist == 0L && r.baseline_mean.isEmpty
      && r.ratio.isEmpty && r.n_hist == 0L), rows.toString)
    assert(rows.map(_.n_last).sum == 10L)
  }

  test("seasonal state from the pre-NUL key schema is rejected loudly, not mis-parsed") {
    val st = new TestGroupState[SeasonState]
    // a v1 checkpoint used "key hr" space-separated state keys; v2 must
    // refuse to resume (fresh-checkpoint contract) instead of throwing
    // NumberFormatException from substring(0).toLong on the whole key
    st.update(SeasonState(0L, Long.MinValue, Map.empty, Map("k 5" -> 3L)))
    st.watermarkMs = 12L * 3600L * 1000L
    val e = intercept[IllegalArgumentException] {
      seasonUpdate("all",
        Iterator(KeyEvent("k", new java.sql.Timestamp(10L * 3600L * 1000L))),
        st).toList
    }
    assert(e.getMessage.contains("fresh checkpoint"), e.getMessage)
  }

  // ------------------------------------------------------- r28 incidents

  test("incident summaries equal the batch lead-pairing over real events") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts",
        if (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts div 1000")) else col("ts"))
    // the r23 lag rule over the r16 verdicts — the edge stream an
    // alert manager would feed this operator (AlertEdgesSpec pins the
    // streaming version of this fold)
    val verdicts = Windows.rateAnomaly(ev, "ts", "event_type")
      .select(col("key"), col("hr_start"), col("is_anomaly"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .groupBy(_._1)
    val edges = verdicts.toSeq.flatMap { case (k, vs) =>
      vs.sortBy(_._2).foldLeft((Seq.empty[(String, Long, String)], false)) {
        case ((acc, prev), (_, hr, an)) =>
          (if (an != prev) acc :+ ((k, hr, if (an) "fire" else "resolve"))
           else acc, an)
      }._1
    }.sortBy(_._2)
    assert(edges.nonEmpty, "test corpus produced no alert edges")
    val input = MemoryStream[(String, Long, String)]
    val edgeDs = input.toDF().toDF("key", "hrStart", "edge")
      .as[AlertEdges.Edge]
    val q = SloMonitor.incidents(edgeDs)
      .writeStream.format("memory").queryName("inc")
      .outputMode(OutputMode.Append()).start()
    try {
      // split mid-stream: open incidents must survive the boundary
      val (h1, h2) = edges.splitAt(edges.length / 2)
      input.addData(h1: _*); q.processAllAvailable()
      input.addData(h2: _*); q.processAllAvailable()
      val got = spark.table("inc").as[IncidentSummary].collect()
        .groupBy(_.key).map { case (k, rs) => rs.maxBy(_.as_of) }
        .map(r => (r.key, r.n_incidents, r.n_open, r.mttr_hours, r.max_hours))
        .toSeq.sortBy(_._1)
      val batch = Windows.incidents(ev, "ts", "event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toSeq.sortBy(_._1)
      assert(got == batch, s"\nstream: $got\nbatch: $batch")
    } finally q.stop()
  }

  test("storm stream equals the batch gap-split over real fire edges") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .withColumn("ts",
        if (spark.read.parquet("/root/testdata/sf0.01/events.parquet")
          .schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts div 1000")) else col("ts"))
    val verdicts = Windows.rateAnomaly(ev, "ts", "event_type")
      .select(col("key"), col("hr_start"), col("is_anomaly"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .groupBy(_._1)
    val edges = verdicts.toSeq.flatMap { case (k, vs) =>
      vs.sortBy(_._2).foldLeft((Seq.empty[(String, Long, String)], false)) {
        case ((acc, prev), (_, hr, an)) =>
          (if (an != prev) acc :+ ((k, hr, if (an) "fire" else "resolve"))
           else acc, an)
      }._1
    }.sortBy(_._2)
    assert(edges.count(_._3 == "fire") > 1, "test corpus has too few fires")
    // a far-future resolve advances the watermark past the last storm
    val flushHr = edges.map(_._2).max + 100L * 3600L
    val input = MemoryStream[(String, Long, String)]
    val edgeDs = input.toDF().toDF("key", "hrStart", "edge")
      .as[AlertEdges.Edge]
    val q = SloMonitor.storms(edgeDs, gapHours = 2)
      .writeStream.format("memory").queryName("storms")
      .outputMode(OutputMode.Append()).start()
    try {
      val (h1, h2) = edges.splitAt(edges.length / 2)
      input.addData(h1: _*); q.processAllAvailable()
      input.addData(h2 :+ (("flush", flushHr, "resolve")): _*)
      q.processAllAvailable()
      // a second flusher batch that REACHES the group (a fire): the
      // trailing real storm closes in the data path under the first
      // flusher's now-current watermark; the flush-fire's own storm
      // stays open and never emits
      input.addData(("flush", flushHr + 100L * 3600L, "fire"))
      q.processAllAvailable()
      val got = spark.table("storms").as[SloMonitor.StormRow].collect()
        .map(r => (r.storm_start, r.storm_end, r.n_fires, r.n_keys,
          r.span_hours, r.keys))
        .toSeq.sortBy(_._1)
      val batch = Windows.alertStorms(ev, "ts", "event_type", gapHours = 2)
        .orderBy("storm_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5)))
        .toSeq
      assert(got == batch, s"\nstream: $got\nbatch: $batch")
    } finally q.stop()
  }

  test("storm transition: gap split, cross-key dedup, watermark close") {
    val st = new TestGroupState[SloMonitor.StormAgg]
    import SloMonitor.FireEdge
    // two fires 1h apart (merge), same key twice (n_keys dedup)
    val out1 = SloMonitor.stormUpdate(2)("all", Iterator(
      FireEdge("a", new java.sql.Timestamp(10L * 3600L * 1000L)), FireEdge("b", new java.sql.Timestamp(11L * 3600L * 1000L)),
      FireEdge("a", new java.sql.Timestamp(12L * 3600L * 1000L))), st).toList
    assert(out1.isEmpty && st.updated.get.n == 3L
      && st.updated.get.keys.sorted == Seq("a", "b"))
    // a fire > 2h later closes the open storm and starts a new one
    val out2 = SloMonitor.stormUpdate(2)("all",
      Iterator(FireEdge("c", new java.sql.Timestamp(20L * 3600L * 1000L))), st).toList
    assert(out2.map(r => (r.storm_start, r.storm_end, r.n_fires, r.n_keys,
      r.span_hours, r.keys))
      == List((10L * 3600L, 12L * 3600L, 3L, 2L, 2L, "a,b")))
    // watermark past last + gap closes the trailing storm (timeout path)
    st.watermarkMs = 30L * 3600L * 1000L
    val out3 = SloMonitor.stormUpdate(2)("all", Iterator.empty, st).toList
    assert(out3.map(r => (r.storm_start, r.n_fires, r.keys))
      == List((20L * 3600L, 1L, "c")))
    assert(st.updated.isEmpty)
  }

  test("an open storm survives a checkpointed restart") {
    // run 1 ends with a storm OPEN; run 2 resumes from the checkpoint
    // and must close it with run-1's fires intact — the StormAgg
    // state round-trips through the state store across process-style
    // restarts, not just micro-batches
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-storm").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft-storm-ckpt").toFile
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("hrStart",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("edge",
        org.apache.spark.sql.types.StringType)))
    def run(name: String): Seq[SloMonitor.StormRow] = {
      // memory sink can't recover a checkpoint; foreachBatch can
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[SloMonitor.StormRow]()
      val edges = spark.readStream.schema(schema)
        .json(dir.getAbsolutePath).as[AlertEdges.Edge]
      val q = SloMonitor.storms(edges, gapHours = 2)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[SloMonitor.StormRow],
                       _: Long) => { b.collect().foreach(buf.add); () })
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq
    }
    def write(f: String, rows: Seq[(String, Long, String)]): Unit = {
      val txt = rows.map { case (k, h, e) =>
        s"""{"key":"$k","hrStart":$h,"edge":"$e"}""" }.mkString("\n")
      java.nio.file.Files.write(new java.io.File(dir, f).toPath,
        txt.getBytes("UTF-8"))
      ()
    }
    write("e1.json", Seq(("a", 10L * 3600L, "fire"), ("b", 11L * 3600L, "fire")))
    assert(run("storm_r1").isEmpty, "storm must still be open after run 1")
    // run 2: hour 20 closes {10,11}; hour 200 closes {20}
    write("e2.json", Seq(("c", 20L * 3600L, "fire"), ("z", 200L * 3600L, "fire")))
    val out = run("storm_r2").sortBy(_.storm_start)
    assert(out.map(r => (r.storm_start / 3600L, r.storm_end / 3600L,
      r.n_fires, r.keys))
      == Seq((10L, 11L, 2L, "a,b"), (20L, 20L, 1L, "c")), out.toString)
  }

  test("burn-rate state runs on the RocksDB state store provider") {
    // the 100 TB state-backend check, applied to the newest stateful
    // operator family: same query, disk-backed incremental store
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = burnEvents(0 until 8)
      val input = MemoryStream[(Long, Boolean)]
      val events = input.toDF().toDF("tsSec", "isError")
        .withColumn("ts", timestamp_seconds(col("tsSec")))
        .withWatermark("ts", "0 seconds")
        .select("ts", "isError").as[ErrEvent]
      val q = burnFrames(events, windowsHours = Seq(1, 6))
        .writeStream.format("memory").queryName("rocks_burn")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(rows.filter(_._1 < 4L * 3600L): _*)
        q.processAllAvailable()
        input.addData(rows.filter(_._1 >= 4L * 3600L) :+ (9L * 3600L + 1, false): _*)
        q.processAllAvailable()
        val got = spark.table("rocks_burn").as[BurnFrame].collect().toSeq
        val last = got.filter(_.as_of == 7L * 3600L).sortBy(_.window_hours)
        assert(last == batchBurnAt(rows, 7L, Seq(1, 6)),
          s"\nstream: $last\nbatch: ${batchBurnAt(rows, 7L, Seq(1, 6))}")
      } finally q.stop()
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  test("incidents ignore stale replays and malformed sequences") {
    val st = new TestGroupState[IncidentState]
    import AlertEdges.Edge
    val out1 = incidentUpdate("k",
      Iterator(Edge("k", 10L * 3600L, "fire")), st).toList
    assert(out1.map(r => (r.n_incidents, r.n_open)) == List((1L, 1L)))
    // stale replay of the same fire: no new incident
    assert(incidentUpdate("k",
      Iterator(Edge("k", 10L * 3600L, "fire")), st).isEmpty)
    val out2 = incidentUpdate("k",
      Iterator(Edge("k", 13L * 3600L, "resolve")), st).toList
    assert(out2.map(r => (r.n_incidents, r.n_open, r.mttr_hours, r.max_hours))
      == List((1L, 0L, Some(3.0), Some(3L))))
    // a second resolve with nothing open is ignored, not banked
    val out3 = incidentUpdate("k",
      Iterator(Edge("k", 15L * 3600L, "resolve")), st).toList
    assert(out3.map(r => (r.n_incidents, r.mttr_hours)) == List((1L, Some(3.0))))
  }
}
