package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurateStreamSpec extends SparkSpec {

  test("incremental curation gates, dedups, and surfaces near-dup candidates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = (1 to 40).map(i => s"word$i").mkString(" ") + " the quick brown fox dog"

    val input = MemoryStream[(Long, Long, String)]
    val docs = input.toDF().toDF("id", "sec", "text")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val (curated, candidates) = CurateStream(
      docs, "id", "ts", "text", delay = "10 minutes")
    val q1 = curated.writeStream.format("memory").queryName("cur_out")
      .outputMode("append").start()
    val q2 = candidates.writeStream.format("memory").queryName("cur_cand")
      .outputMode("append").start()
    try {
      // doc 1 clean; doc 2 exact dup of 1; doc 3 junk (gated out)
      input.addData((1L, 100L, base), (2L, 110L, base), (3L, 120L, "@ @ @ @"))
      q1.processAllAvailable(); q2.processAllAvailable()
      // doc 4 near-dup of 1 (one word changed): passes exact dedup but
      // must surface as a candidate pair against doc 1
      input.addData((4L, 200L, base.replace("dog", "cat")))
      q1.processAllAvailable(); q2.processAllAvailable()

      val kept = spark.table("cur_out").select("id").as[Long].collect().sorted
      assert(kept.toSeq == Seq(1L, 4L), kept.toSeq.toString)
      // the exact dup (2) also shares every bucket with 1, so it
      // surfaces as a candidate alongside the true near-dup (4)
      val pairs = spark.table("cur_cand").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L), (1L, 4L)), pairs.toString)
    } finally { q1.stop(); q2.stop() }
  }

  test("streaming crawl-ingest dedup by CANONICAL url across micro-batches") {
    // the ingest-side twin of d13: the same page arriving under
    // different surface forms (case, www, default port, utm params,
    // fragment) must dedup to one kept row, with state bounded by the
    // watermark — canonicalizeUrl feeds streamingExact unchanged
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val pages = input.toDF().toDF("id", "sec", "url")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("canon_url",
        graft.functions.TextFunctions.canonicalizeUrl(col("url")))
    val deduped = graft.operators.Dedup.streamingExact(
      pages, "ts", "canon_url", delay = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("url_dedup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, 100L, "HTTP://WWW.Site.COM:80/a/?utm_source=x&p=1"),
        (2L, 110L, "http://site.com/a?p=1#frag")) // same page, later form
      q.processAllAvailable()
      // a batch boundary between duplicates: state must carry over
      input.addData(
        (3L, 120L, "http://site.com/a?p=1"),
        (4L, 130L, "https://site.com/a?p=1")) // DIFFERENT scheme: kept
      q.processAllAvailable()
      val kept = spark.table("url_dedup").select("id").as[Long].collect().sorted
      assert(kept.toSeq == Seq(1L, 4L), kept.toSeq.toString)
    } finally q.stop()
  }

  test("semGate drops prototype-ball members per micro-batch, identically to batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // two fixed prototypes on axes 0 and 1; docs 1/3 are inside a
    // prototype ball (cos >= 0.95), docs 2/4 are their cluster's
    // honest outliers
    val cents = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("cid", "cvec")
    val rows = Seq(
      (1L, Array(0.99f, 0.01f, 0.0f, 0.0f)),  // ball of centroid 0: dropped
      (2L, Array(0.6f, 0.0f, 0.8f, 0.0f)),    // cluster 0, cos 0.6: kept
      (3L, Array(0.01f, 0.99f, 0.0f, 0.0f)),  // ball of centroid 1: dropped
      (4L, Array(0.0f, 0.7f, 0.0f, 0.71f)))   // cluster 1, kept
    val input = MemoryStream[(Long, Array[Float])]
    val gated = CurateStream.semGate(input.toDF().toDF("id", "embedding"),
      "embedding", cents, "cid", "cvec", threshold = 0.95)
    val q = gated.select("id", "cluster").writeStream.format("memory")
      .queryName("sem_gate").outputMode("append").start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*) // batch boundary between clusters
      q.processAllAvailable()
      val kept = spark.table("sem_gate").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(kept == Set((2L, 0L), (4L, 1L)), kept.toString)
      // stateless: the batch path over the same frame, same expression,
      // makes the same decisions
      val batchKept = CurateStream.semGate(rows.toDF("id", "embedding"),
          "embedding", cents, "cid", "cvec", threshold = 0.95)
        .select("id", "cluster").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchKept == kept, s"batch=$batchKept stream=$kept")
      // null embedding = no similarity evidence = KEEP (the batch
      // gates' dirty-input rule), not a silent null-predicate drop
      val withNull = (rows :+ (5L, null.asInstanceOf[Array[Float]]))
        .toDF("id", "embedding")
      val keptRows = CurateStream.semGate(withNull,
          "embedding", cents, "cid", "cvec", threshold = 0.95)
        .select("id", "cluster", "centroid_cos").collect()
      val keptIds = keptRows.map(_.getLong(0)).toSet
      assert(keptIds == Set(2L, 4L, 5L), keptIds.toString)
      // ...and the no-evidence row is visibly UNASSIGNED: null
      // cluster + cos, not the arbitrary lowest centroid id an
      // all-null argmin sort would have picked
      val nullRow = keptRows.find(_.getLong(0) == 5L).get
      assert(nullRow.isNullAt(1) && nullRow.isNullAt(2), nullRow.toString)
    } finally q.stop()
  }

  test("repetitionGate drops repetitive docs with the batch op's exact verdicts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val clean = (0 until 60).map(i => f"w$i%02d").mkString(" ")
    val rows = Seq(
      (1L, clean),
      (2L, clean + "\n" + clean),             // dup line: dropped
      (3L, ("spam ham " * 40).trim))          // top-2-gram: dropped
    val input = MemoryStream[(Long, String)]
    val gated = CurateStream.repetitionGate(
      input.toDF().toDF("id", "text"), "text")
    val q = gated.select("id").writeStream.format("memory")
      .queryName("rep_gate").outputMode("append").start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val kept = spark.table("rep_gate").collect().map(_.getLong(0)).toSet
      val expected = graft.operators.TextStats
        .gopherRepetition(rows.toDF("id", "text"), "id", "text")
        .filter(col("pass")).collect().map(_.getLong(0)).toSet
      assert(kept == expected && kept == Set(1L), s"kept=$kept expected=$expected")
    } finally q.stop()
  }

  test("tokenSketch state merges across micro-batches into the exact batch grid") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val batch1 = Seq((1L, "alpha beta alpha gamma"), (2L, "beta beta delta"))
    val batch2 = Seq((3L, "alpha epsilon  gamma"), (4L, "zeta"))
    val input = MemoryStream[(Long, String)]
    val q = CurateStream.tokenSketch(input.toDF().toDF("id", "text"), "text")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_stream").collect()(0).getSeq[Long](0)
      val batch = CurateStream.tokenSketch(
        (batch1 ++ batch2).toDF("id", "text"), "text").collect()(0).getSeq[Long](0)
      assert(streamed == batch)
      // and the merged grid answers point queries exactly here (no
      // collisions at 6 distinct tokens in 4x1024 buckets)
      val est = Seq("alpha", "zeta", "absent").toDF("term")
        .crossJoin(spark.table("cms_stream"))
        .withColumn("est", graft.functions.CountMinAgg.estimate(
          col("sketch"), col("term"), 1024, 4))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(est == Map("alpha" -> 3L, "zeta" -> 1L, "absent" -> 0L), est.toString)
    } finally q.stop()
  }

  test("distinctSketch state merges across micro-batches into the exact batch sketch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val batch1 = (1L to 40L).map(i => (s"src${i % 2}", i % 7))
    val batch2 = (41L to 80L).map(i => (s"src${i % 2}", i % 13))
    val input = MemoryStream[(String, Long)]
    val q = CurateStream.distinctSketch(
        input.toDF().toDF("source", "user"), "source", "user", k = 8)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("kmv_stream").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val batch = CurateStream.distinctSketch(
          (batch1 ++ batch2).toDF("source", "user"), "source", "user", k = 8)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(streamed == batch)
      // 13 distinct values per source > k=8: the estimation path is
      // live; under-k exactness is covered by the OverlapAuditSpec
      val est = spark.table("kmv_stream")
        .withColumn("est", graft.functions.KmvAgg.distinctEst(col("sketch"), 8))
        .collect().map(r => r.getString(0) -> r.getAs[Double]("est")).toMap
      est.foreach { case (src, e) =>
        assert(e > 4.0 && e < 40.0, s"$src: est $e for 13 distinct")
      }
    } finally q.stop()
  }

  test("gopherGate filters a live stream with the batch op's exact verdicts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val pass = ("the data " * 30).trim +
      " of and that have with real words making sense here now then"
    val rows = Seq(
      (1L, pass),
      (2L, "short doc of and that have with"),        // < 50 words
      (3L, (1 to 60).map(i => s"- item $i").mkString("\n"))) // bullets
    val input = MemoryStream[(Long, String)]
    val gated = CurateStream.gopherGate(input.toDF().toDF("id", "text"), "text")
    val q = gated.select("id").writeStream.format("memory")
      .queryName("gopher_gate").outputMode("append").start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val kept = spark.table("gopher_gate").collect().map(_.getLong(0)).toSet
      // batch verdicts from the report op decide the expectation —
      // the gate and the report share one expression tree
      val expected = graft.operators.TextStats
        .gopherRules(rows.toDF("id", "text"), "id", "text")
        .filter(col("pass")).collect().map(_.getLong(0)).toSet
      assert(kept == expected && kept == Set(1L), s"kept=$kept expected=$expected")
    } finally q.stop()
  }
  test("c4Gate scrubs a live stream to the batch operator's exact kept lines") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Seq(
      (1L, "this first sentence is kept.\nnav menu\nand this one survives too!\na third keeper rounds it out."),
      (2L, "this page looks fine at first.\nlorem ipsum dolor sit amet.\nbut the page rule kills it."),
      (3L, "only one decent sentence here.\nnav\nmenu"))   // below the floor
    val input = MemoryStream[(Long, String)]
    val gated = CurateStream.c4Gate(input.toDF().toDF("id", "text"), "text",
      minKeptLines = 2)
    val q = gated.writeStream.format("memory")
      .queryName("c4_gate").outputMode("append").start()
    try {
      input.addData(rows.take(1): _*)
      q.processAllAvailable()
      input.addData(rows.drop(1): _*)
      q.processAllAvailable()
      val streamed = spark.table("c4_gate").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = graft.operators.TextStats
        .c4LineFilter(rows.toDF("id", "text"), "id", "text", minKeptLines = 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.keySet == Set(1L))
      assert(streamed(1L).linesIterator.size == 3)
    } finally q.stop()
  }
}

