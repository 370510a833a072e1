package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WARC ingestion (r17): record parse off the ISO 28500 byte layout,
  * concatenated-gzip-member decode (the Common Crawl production
  * layout), write→read round trip through real files, and the
  * loud-loss contract — a broken header yields ONE `(corrupt)` row
  * and stops that file's scan (boundaries are gone past it).
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(uri: String, id: String, text: String): Array[Byte] =
    Warc.recordGz(uri, "2024-01-01T00:00:00Z", id, text.getBytes("UTF-8"))

  test("parseRecords reads headers and exact-length payloads") {
    val plain = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(rec("http://a/1", "<urn:1>", "hello world")))
      .readAllBytes()
    val (rs, corrupt) = Warc.parseRecords(plain)
    assert(corrupt.isEmpty && rs.length == 1)
    val r = rs.head
    assert(r.warcType == "response" && r.targetUri == "http://a/1"
      && r.recordId == "<urn:1>"
      && new String(r.content, "UTF-8") == "hello world")
  }

  test("read decodes multi-member .warc.gz files in parallel per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc").toFile
    // two files, two records each — concatenated gzip members
    for ((name, ids) <- Seq(("a.warc.gz", Seq(1, 2)), ("b.warc.gz", Seq(3, 4)))) {
      val out = new java.io.FileOutputStream(new java.io.File(dir, name))
      ids.foreach(i => out.write(rec(s"http://h$i/doc/$i", s"<urn:$i>", s"text $i")))
      out.close()
    }
    val got = Warc.read(spark, dir.getAbsolutePath)
      .select("target_uri", "content_length").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("http://h1/doc/1", 6L), ("http://h2/doc/2", 6L),
      ("http://h3/doc/3", 6L), ("http://h4/doc/4", 6L)), got.toString)
  }

  test("a broken header emits one (corrupt) row and stops that file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-bad").toFile
    val out = new java.io.FileOutputStream(new java.io.File(dir, "x.warc.gz"))
    out.write(rec("http://ok/doc/1", "<urn:1>", "fine"))
    val g = new java.util.zip.GZIPOutputStream(out)
    g.write("GARBAGE NOT A HEADER\r\n".getBytes("US-ASCII")); g.finish()
    out.write(rec("http://lost/doc/2", "<urn:2>", "unreachable"))
    out.close()
    val rows = Warc.read(spark, dir.getAbsolutePath).collect()
    assert(rows.length == 2, rows.mkString("; "))
    assert(rows.count(_.getAs[String]("warc_type") == "(corrupt)") == 1)
    val good = rows.find(_.getAs[String]("warc_type") == "response").get
    assert(good.getAs[String]("target_uri") == "http://ok/doc/1")
    // the record AFTER the corruption is not silently resynced
    assert(!rows.exists(r => r.getAs[String]("target_uri") == "http://lost/doc/2"))
  }

  test("write -> read round trip through the executor-side FS path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-rt").toFile
    val df = Seq(
      (1L, "http://s1/doc/1", "alpha beta"),
      (2L, "http://s2/doc/2", "gamma"),
      (3L, "http://s1/doc/3", "")).toDF("id", "uri", "text")
      .select(col("uri"), lit("2024-01-01T00:00:00Z").as("wd"),
        concat(lit("<urn:"), col("id"), lit(">")).as("rid"),
        encode(col("text"), "UTF-8").as("payload"))
    Warc.write(df.repartition(2), dir.getAbsolutePath,
      "uri", "wd", "rid", "payload")
    val back = Warc.read(spark, dir.getAbsolutePath)
      .select(col("target_uri"), decode(col("content"), "UTF-8").as("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(("http://s1/doc/1", "alpha beta"),
      ("http://s2/doc/2", "gamma"), ("http://s1/doc/3", "")), back.toString)
  }

  test("dir-watch stream: new archive shards parse record-by-record") {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-stream").toFile
    val w0 = new java.io.FileOutputStream(new java.io.File(dir, "s0.warc.gz"))
    w0.write(rec("http://h1/doc/1", "<urn:1>", "one")); w0.close()
    val q = Warc.stream(spark, dir.getAbsolutePath,
        maxFilesPerTrigger = Some(1))
      .select("target_uri", "warc_type")
      .writeStream.format("memory").queryName("warc_dir")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_dir").count() == 1L)
      val w1 = new java.io.FileOutputStream(new java.io.File(dir, "s1.warc.gz"))
      w1.write(rec("http://h2/doc/2", "<urn:2>", "two"))
      w1.write(rec("http://h3/doc/3", "<urn:3>", "three")); w1.close()
      q.processAllAvailable()
      val uris = spark.table("warc_dir").collect().map(_.getString(0)).toSet
      assert(uris == Set("http://h1/doc/1", "http://h2/doc/2",
        "http://h3/doc/3"), uris.toString)
    } finally q.stop()
  }

  test("conversion records (the WET shape) round-trip their type") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wet").toFile
    val df = Seq(("http://a/doc/1", "extracted text")).toDF("uri", "t")
      .select(col("uri"), lit("2024-01-02T00:00:00Z").as("wd"),
        lit("<urn:wet:1>").as("rid"), encode(col("t"), "UTF-8").as("payload"))
    Warc.write(df, dir.getAbsolutePath, "uri", "wd", "rid", "payload",
      contentType = "text/plain", warcType = "conversion")
    val r = Warc.read(spark, dir.getAbsolutePath)
      .select("warc_type", "content_type", "target_uri").head()
    assert(r.getString(0) == "conversion" && r.getString(1) == "text/plain"
      && r.getString(2) == "http://a/doc/1", r.toString)
  }

  test("fileRows is lazy: bytes pull on demand, one record resident") {
    // 32 records x 10 KB, PLAIN .warc (no gzip read-ahead): a counting
    // stream proves record-at-a-time residency — the r17 scale finding
    // was a task holding the whole decompressed archive as Rows
    val counter = new java.util.concurrent.atomic.AtomicLong
    class Counting(in: java.io.InputStream)
        extends java.io.FilterInputStream(in) {
      override def read(): Int =
        { val b = super.read(); if (b >= 0) counter.incrementAndGet(); b }
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        { val n = super.read(b, off, len); if (n > 0) counter.addAndGet(n); n }
    }
    def plainRec(i: Int, payload: Array[Byte]): Array[Byte] =
      new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(
        rec(s"http://h/$i", s"<urn:$i>", new String(payload, "UTF-8"))))
        .readAllBytes()
    val payload = ("x" * 10000).getBytes("UTF-8")
    val one = plainRec(0, payload)
    val bytes = Array.range(0, 32).flatMap(i => plainRec(i, payload))
    counter.set(0L)
    val it = Warc.fileRows("mem.warc", bytes.length.toLong,
      () => new Counting(new java.io.ByteArrayInputStream(bytes)))
    assert(counter.get == 0L) // construction reads nothing
    val first = it.next()
    assert(first.getLong(5) == 10000L)
    // after ONE record the stream has advanced ~one record, not the
    // 32-record archive
    assert(counter.get < one.length.toLong + 64,
      s"consumed=${counter.get} of ${bytes.length}")
    assert(it.size == 31) // drains clean, no corrupt trailer
    // .gz path: residency is bounded by the 64 KB read-ahead buffer,
    // not the archive (32 x 64 KB incompressible members ~ 2 MB gz)
    val rnd = new scala.util.Random(7)
    val gzBytes = Array.range(0, 32).flatMap { i =>
      val p = new Array[Byte](65536); rnd.nextBytes(p)
      Warc.recordGz(s"http://h/$i", "2024-01-01T00:00:00Z", s"<urn:$i>", p)
    }
    counter.set(0L)
    val git = Warc.fileRows("mem.warc.gz", gzBytes.length.toLong,
      () => new Counting(new java.io.ByteArrayInputStream(gzBytes)))
    val g1 = git.next()
    assert(g1.getLong(5) == 65536L)
    assert(counter.get < 256L * 1024,
      s"gz consumed=${counter.get} of ${gzBytes.length}")
    assert(git.size == 31)
  }

  test("negative Content-Length and empty shards honor the loud-loss contract") {
    // negative length: a (corrupt) row, not an Arrays.copyOfRange crash
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: -5\r\n\r\n").getBytes("US-ASCII")
    val (rs, corrupt) = Warc.parseRecords(bad)
    assert(rs.isEmpty && corrupt.contains(0L), s"$rs $corrupt")
    // empty .warc.gz (an empty writer partition's would-be output):
    // zero records, zero errors
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-empty").toFile
    new java.io.FileOutputStream(new java.io.File(dir, "empty.warc.gz")).close()
    val w = new java.io.FileOutputStream(new java.io.File(dir, "ok.warc.gz"))
    w.write(rec("http://a/1", "<urn:1>", "x")); w.close()
    val rows = Warc.read(spark, dir.getAbsolutePath).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("warc_type") == "response")
    // gzip-garbled shard: one (corrupt) row, not a task crash
    val g = new java.io.FileOutputStream(new java.io.File(dir, "junk.warc.gz"))
    g.write("not gzip at all".getBytes("US-ASCII")); g.close()
    val rows2 = Warc.read(spark, dir.getAbsolutePath).collect()
    assert(rows2.count(_.getAs[String]("warc_type") == "(corrupt)") == 1,
      rows2.mkString("; "))
  }
}
