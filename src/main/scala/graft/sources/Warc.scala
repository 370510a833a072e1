package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500 — the Common Crawl / web-archive record format)
  * ingestion: the OTHER format crawl dumps actually arrive in beside
  * JSONL (r42). A WARC file is a sequence of records, each
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: http://...\r\n
  * Content-Length: N\r\n
  * ...\r\n
  * \r\n
  * <N payload bytes> \r\n\r\n
  * }}}
  *
  * and the production `.warc.gz` layout gzip-compresses EVERY RECORD
  * as its own member, concatenated — that is what makes a 1 GB
  * Common Crawl file streamable record-by-record without decoding
  * the whole archive (GZIPInputStream reads concatenated members
  * natively, so the reader below handles both plain and .gz).
  *
  * Shape at scale: WARC is unsplittable WITHIN a file (record
  * boundaries are only discoverable by scanning), so the unit of
  * parallelism is the FILE — exactly how the format is deployed
  * (Common Crawl ships ~1 GB files by the hundred thousand; one
  * Spark task per file is the intended layout). The reader uses
  * `binaryFile` + a per-file record iterator; a directory of many
  * files scans embarrassingly parallel. Payloads land as BINARY
  * with typed header metadata beside them (the multimodal
  * opaque-bytes discipline) — decoding is the caller's explicit
  * choice, never implicit.
  *
  * Loud-loss contract (the r41/r42 `_corrupt` discipline): a record
  * whose header fails to parse emits ONE `(corrupt)` row carrying
  * the file and byte offset, and scanning of that file stops there —
  * past a broken header the record boundaries are gone, and
  * silently resynchronizing risks mis-attributed payloads.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("warc_date", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("content", BinaryType),
    StructField("source_file", StringType),
    StructField("record_offset", LongType)))

  final case class WarcRecord(warcType: String, recordId: String,
                              warcDate: String, targetUri: String,
                              contentType: String, content: Array[Byte])

  /** Parse the records of one (fully decompressed) WARC byte stream.
    * Returns (records, corruptOffset): corruptOffset is Some(pos) if
    * scanning stopped at an unparseable header.
    */
  def parseRecords(bytes: Array[Byte]): (Seq[WarcRecord], Option[Long]) = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      i
    }
    while (pos < bytes.length) {
      // skip inter-record \r\n padding
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n')
        pos += 2
      if (pos >= bytes.length) return (out.result(), None)
      val firstEnd = lineEnd(pos)
      val version = new String(bytes, pos, firstEnd - pos, "US-ASCII")
      if (!version.startsWith("WARC/")) return (out.result(), Some(pos.toLong))
      var p = firstEnd + 2
      var headers = Map.empty[String, String]
      var done = false
      while (!done) {
        val e = lineEnd(p)
        if (e == p) { done = true; p += 2 } // blank line = end of headers
        else {
          val line = new String(bytes, p, e - p, "US-ASCII")
          val ci = line.indexOf(':')
          if (ci < 0) return (out.result(), Some(pos.toLong))
          headers += (line.substring(0, ci).trim.toLowerCase ->
            line.substring(ci + 1).trim)
          p = e + 2
        }
        if (p > bytes.length) return (out.result(), Some(pos.toLong))
      }
      val len = headers.get("content-length").flatMap(_.toLongOption)
        .getOrElse(return (out.result(), Some(pos.toLong)))
      if (p + len > bytes.length) return (out.result(), Some(pos.toLong))
      val content = java.util.Arrays.copyOfRange(bytes, p, p + len.toInt)
      out += WarcRecord(
        headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-record-id", ""),
        headers.getOrElse("warc-date", ""),
        headers.getOrElse("warc-target-uri", ""),
        headers.getOrElse("content-type", ""),
        content)
      pos = p + len.toInt
    }
    (out.result(), None)
  }

  private def gunzipAll(gz: Array[Byte]): Array[Byte] = {
    // GZIPInputStream consumes CONCATENATED members (the record-per-
    // member production layout) in one pass
    val in = new GZIPInputStream(new ByteArrayInputStream(gz), 64 * 1024)
    val out = new ByteArrayOutputStream(gz.length * 4)
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: EOFException => () } // truncated trailing member
    in.close()
    out.toByteArray
  }

  /** Read a WARC file/glob/directory (plain `.warc` or
    * member-compressed `.warc.gz`) into the typed record frame. One
    * task per file by format necessity — see the scaladoc above.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("path"), col("content"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    files.flatMap { row =>
      val path = row.getString(0)
      val raw = row.getAs[Array[Byte]](1)
      val bytes = if (path.endsWith(".gz")) gunzipAll(raw) else raw
      val (recs, corrupt) = parseRecords(bytes)
      recs.map(r => Row(r.warcType, r.recordId, r.warcDate, r.targetUri,
        r.contentType, r.content.length.toLong, r.content, path, -1L)) ++
        corrupt.map(off => Row("(corrupt)", null, null, null, null, 0L,
          Array.empty[Byte], path, off))
    }(enc)
  }

  /** Dir-watch streaming form: new `.warc`/`.warc.gz` shards landing
    * in an archive directory parse record-by-record exactly as in
    * [[read]] — the tail workflow for a live crawl's output dir. One
    * file is one task here too; `maxFilesPerTrigger` bounds a batch.
    */
  def stream(spark: SparkSession, dir: String,
             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var reader = spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      // streaming sources need the schema stated (no inference pass);
      // binaryFile's is fixed
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    val files = reader.load(dir).select(col("path"), col("content"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    files.flatMap { row =>
      val p = row.getString(0)
      val raw = row.getAs[Array[Byte]](1)
      val bytes = if (p.endsWith(".gz")) gunzipAll(raw) else raw
      val (recs, corrupt) = parseRecords(bytes)
      recs.map(r => Row(r.warcType, r.recordId, r.warcDate, r.targetUri,
        r.contentType, r.content.length.toLong, r.content, p, -1L)) ++
        corrupt.map(off => Row("(corrupt)", null, null, null, null, 0L,
          Array.empty[Byte], p, off))
    }(enc)
  }

  /** Write one WARC response record in the production layout: its own
    * gzip member. Used by the writer half and the r43 synthesis. */
  def recordGz(targetUri: String, date: String, recordId: String,
               payload: Array[Byte],
               contentType: String = "text/plain"): Array[Byte] = {
    val header =
      s"""WARC/1.0\r
WARC-Type: response\r
WARC-Record-ID: $recordId\r
WARC-Date: $date\r
WARC-Target-URI: $targetUri\r
Content-Type: $contentType\r
Content-Length: ${payload.length}\r
\r
""".getBytes("US-ASCII")
    val bos = new ByteArrayOutputStream(header.length + payload.length + 64)
    val g = new GZIPOutputStream(bos)
    g.write(header); g.write(payload); g.write("\r\n\r\n".getBytes("US-ASCII"))
    g.close()
    bos.toByteArray
  }

  /** Write a DataFrame of (uri, date, recordId, payload) rows as
    * multi-file `.warc.gz` under `dir` — one file per partition,
    * records as concatenated gzip members (the Common Crawl layout),
    * written executor-side through the Hadoop FS API so the path
    * scales with partitions, not the driver.
    */
  def write(df: DataFrame, dir: String, uriCol: String, dateCol: String,
            idCol: String, payloadCol: String): Unit = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    df.select(col(uriCol).cast("string"), col(dateCol).cast("string"),
        col(idCol).cast("string"), col(payloadCol).cast("binary"))
      .rdd.foreachPartition { it =>
        val tid = org.apache.spark.TaskContext.get().partitionId()
        val p = new org.apache.hadoop.fs.Path(dir, f"part-$tid%05d.warc.gz")
        val fs = p.getFileSystem(conf.value)
        val out = fs.create(p, true)
        it.foreach { r =>
          out.write(recordGz(r.getString(0), r.getString(1), r.getString(2),
            r.getAs[Array[Byte]](3)))
        }
        out.close()
      }
  }
}
