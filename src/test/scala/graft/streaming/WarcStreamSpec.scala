package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Warc

/** Streaming crawl intake (r18 verdict task 7): the r44 report
  * composed over `Warc.stream` (dir-watch) must reproduce the batch
  * report exactly when the same archives arrive as two stream
  * batches — the Jsonl.follow parity discipline applied to the
  * intake chain. One shard is on disk before the stream starts, one
  * lands while tailing; complete-mode aggregation state is |hosts|
  * rows.
  */
class WarcStreamSpec extends SparkSpec {

  private def httpPage(host: String, id: Int, text: String): Array[Byte] = {
    val html = s"<html><head><title>D$id</title></head>" +
      s"<body><h1>$host</h1><p>$text &amp; more</p></body></html>"
    val msg = "HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${html.getBytes("UTF-8").length}\r\n\r\n" + html
    Warc.recordGz(s"http://$host/doc/$id", "2024-01-01T00:00:00Z",
      s"<urn:graft:$id>", msg.getBytes("UTF-8"),
      "application/http; msgtype=response")
  }

  private def toMap(rows: Array[Row]): Map[String, (Long, Long, Long)] =
    rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
      r.getLong(3))).toMap

  test("two-batch archive drop reproduces the batch r44 report") {
    val dir = java.nio.file.Files.createTempDirectory("graft-intake").toFile
    val w0 = new java.io.FileOutputStream(new java.io.File(dir, "s0.warc.gz"))
    w0.write(httpPage("a.example", 1, "alpha beta gamma"))
    w0.write(httpPage("b.example", 2, "delta"))
    w0.close()
    val q = CrawlIntake.report(
        Warc.stream(spark, dir.getAbsolutePath, maxFilesPerTrigger = Some(1)))
      .writeStream.format("memory").queryName("intake_parity")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(toMap(spark.table("intake_parity").collect()).keySet ==
        Set("a.example", "b.example"))
      // the second shard lands while the stream is tailing the dir
      val w1 = new java.io.FileOutputStream(new java.io.File(dir, "s1.warc.gz"))
      w1.write(httpPage("b.example", 3, "epsilon zeta"))
      w1.write(httpPage("c.example", 4, "eta theta iota kappa"))
      w1.close()
      q.processAllAvailable()
      val streamed = toMap(spark.table("intake_parity").collect())
      val batch = toMap(
        CrawlIntake.report(Warc.read(spark, dir.getAbsolutePath)).collect())
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(streamed.keySet == Set("a.example", "b.example", "c.example"))
      // the extraction really ran: entity decoded, tags dropped
      assert(streamed("b.example")._1 == 2L) // two pages across batches
      // "D1 a.example alpha beta gamma & more" — title survives,
      // tags drop, &amp; decodes
      assert(streamed("a.example")._2 == 7L,
        streamed("a.example").toString)
    } finally q.stop()
  }

  test("streaming WET sink: two-batch tail writes the batch export") {
    val in = java.nio.file.Files.createTempDirectory("graft-wet-in").toFile
    val outDir = java.nio.file.Files.createTempDirectory("graft-wet-out")
      .toFile.getAbsolutePath
    val ck = java.nio.file.Files.createTempDirectory("graft-wet-ck")
      .toFile.getAbsolutePath
    val w0 = new java.io.FileOutputStream(new java.io.File(in, "s0.warc.gz"))
    w0.write(httpPage("a.example", 1, "alpha beta")); w0.close()
    val q = CrawlIntake.wetSink(
      Warc.stream(spark, in.getAbsolutePath, maxFilesPerTrigger = Some(1)),
      outDir, ck)
    try {
      q.processAllAvailable()
      val w1 = new java.io.FileOutputStream(new java.io.File(in, "s1.warc.gz"))
      w1.write(httpPage("b.example", 2, "gamma"))
      w1.write(httpPage("c.example", 3, "delta epsilon")); w1.close()
      q.processAllAvailable()
    } finally q.stop()
    def keyed(rows: Array[Row]) = rows
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val streamed = keyed(Warc.read(spark, outDir)
      .select(col("record_id"), col("warc_type"),
        decode(col("content"), "UTF-8")).collect())
    val batch = keyed(CrawlIntake.wetRecords(
        Warc.read(spark, in.getAbsolutePath))
      .select(col("rid"), lit("conversion"),
        decode(col("payload"), "UTF-8")).collect())
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(streamed.size == 3 && streamed.forall(_._2 == "conversion"))
    // micro-batches landed as their own shards, no clobbering
    val shards = new java.io.File(outDir).list().filter(_.endsWith(".warc.gz"))
    assert(shards.map(_.split("-")(1)).distinct.length >= 2, shards.mkString(","))
  }
}
