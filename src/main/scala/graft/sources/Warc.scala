package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException,
  IOException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
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
  * Spark task per file is the intended layout). The readers use the
  * `binaryFile` source ONLY to list (path, length) — the `content`
  * column is never projected, so the source reads no bytes and its
  * 2 GB per-file cap does not apply — then open an executor-side
  * Hadoop FS stream per file and pull records LAZILY off it: a
  * task's live memory is ONE record (plus the gzip read-ahead
  * buffer), never the file and never the decompressed archive, so
  * an arbitrarily large archive scans in bounded memory as long as
  * each RECORD fits. Payloads land as BINARY with typed header
  * metadata beside them (the multimodal opaque-bytes discipline) —
  * decoding is the caller's explicit choice, never implicit.
  *
  * Loud-loss contract (the r41/r42 `_corrupt` discipline): a record
  * whose header fails to parse — including a malformed or negative
  * Content-Length, a truncated payload, or a gzip-level error
  * mid-file — emits ONE `(corrupt)` row carrying the file and
  * approximate byte offset, and scanning of that file stops there:
  * past a broken header the record boundaries are gone, and silently
  * resynchronizing risks mis-attributed payloads. An EMPTY file (a
  * legitimate no-records shard) yields zero rows, not an error.
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

  /** Malformed-line sentinel: a value no parsed header line can be
    * (readLine strips the terminator, and a NUL inside a header is
    * itself malformed). Written as an escape so the source file stays
    * plain text for diff/blame. */
  private val Bad = "\u0000"

  /** Streaming record parse: pulls records off `in` one at a time —
    * never the whole archive — tracking the DECOMPRESSED byte offset.
    * Returns (records, corruptOffset): corruptOffset = Some(pos) when
    * scanning stopped at an unparseable record.
    */
  private def parseStream(in: InputStream)
      : (Iterator[WarcRecord], () => Option[Long]) = {
    var pos = 0L
    var corrupt: Option[Long] = None
    var done = false
    def read(): Int = { val b = in.read(); if (b >= 0) pos += 1; b }
    // one \r\n-terminated line, bytes decoded as UTF-8 (real Common
    // Crawl header values — WARC-Target-URI — are UTF-8, not ASCII);
    // None on EOF-at-start, the Bad sentinel on a bare \r or an
    // unterminated line
    def readLine(): Option[String] = {
      val buf = new ByteArrayOutputStream(96)
      var b = read()
      if (b < 0) return None
      while (b >= 0) {
        if (b == '\r') {
          val nl = read()
          if (nl == '\n') return Some(new String(buf.toByteArray, UTF_8))
          return Some(Bad) // malformed line ending → header parse fails
        }
        buf.write(b)
        b = read()
      }
      Some(Bad) // EOF mid-line
    }
    def nextRecord(): Option[WarcRecord] = {
      if (done) return None
      var start = pos
      var first = readLine()
      // tolerate inter-record blank lines
      while (first.contains("")) { start = pos; first = readLine() }
      first match {
        case None => done = true; return None
        case Some(v) if !v.startsWith("WARC/") =>
          corrupt = Some(start); done = true; return None
        case _ => ()
      }
      var headers = Map.empty[String, String]
      var line = readLine()
      while (line.exists(_.nonEmpty)) {
        val l = line.get
        val ci = l.indexOf(':')
        if (ci < 0 || l == Bad) {
          corrupt = Some(start); done = true; return None
        }
        headers += (l.substring(0, ci).trim.toLowerCase ->
          l.substring(ci + 1).trim)
        line = readLine()
      }
      if (line.isEmpty) { // EOF where the blank header terminator belongs
        corrupt = Some(start); done = true; return None
      }
      val len = headers.get("content-length").flatMap(_.toLongOption)
        .getOrElse(-1L)
      if (len < 0 || len > Int.MaxValue - 16) { // absent/negative/absurd
        corrupt = Some(start); done = true; return None
      }
      val content = new Array[Byte](len.toInt)
      var off = 0
      while (off < content.length) {
        val n = in.read(content, off, content.length - off)
        if (n < 0) { corrupt = Some(start); done = true; return None }
        off += n
      }
      pos += len
      Some(WarcRecord(
        headers.getOrElse("warc-type", ""),
        headers.getOrElse("warc-record-id", ""),
        headers.getOrElse("warc-date", ""),
        headers.getOrElse("warc-target-uri", ""),
        headers.getOrElse("content-type", ""),
        content))
    }
    val it = Iterator.continually(nextRecord()).takeWhile(_.isDefined)
      .flatten
    (it, () => corrupt)
  }

  /** Parse the records of one fully-decompressed WARC byte array —
    * the bounded convenience form (specs, small archives). The
    * file readers stream instead.
    */
  def parseRecords(bytes: Array[Byte]): (Seq[WarcRecord], Option[Long]) = {
    val (it, corrupt) = parseStream(new ByteArrayInputStream(bytes))
    val recs = it.toVector
    (recs, corrupt())
  }

  private def corruptRow(path: String, off: Long): Row =
    Row("(corrupt)", null, null, null, null, 0L, Array.empty[Byte], path, off)

  /** Shared per-file decode: extension-routed (de)compression around
    * the streaming parse, every failure mode folded into the
    * loud-loss row contract. LAZY — the returned iterator holds one
    * record at a time; the stream opens on construction, closes on
    * exhaustion (and on task completion, so an abandoned iterator —
    * a `limit` that stopped pulling — cannot leak the handle). Used
    * VERBATIM by [[read]] and [[stream]] so batch and streaming
    * cannot drift.
    */
  private[sources] def fileRows(path: String, length: Long,
      open: () => InputStream): Iterator[Row] = {
    if (length == 0L) return Iterator.empty // an empty shard = no records
    val base = try open() catch {
      case _: EOFException | _: IOException =>
        return Iterator.single(corruptRow(path, 0L))
    }
    val in: InputStream = try {
      if (path.endsWith(".gz")) new GZIPInputStream(base, 64 * 1024)
      else base
    } catch {
      case _: EOFException | _: IOException =>
        // not even a readable stream (e.g. a gzip-garbled prefix)
        try base.close() catch { case _: IOException => () }
        return Iterator.single(corruptRow(path, 0L))
    }
    val (recs, corrupt) = parseStream(in)
    val rows = new Iterator[Row] {
      private var pending: Row = null
      private var finished = false
      private var closed = false
      private def closeQuietly(): Unit = if (!closed) {
        closed = true
        try in.close() catch { case _: EOFException | _: IOException => () }
      }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeQuietly()))
      def hasNext: Boolean = {
        if (pending == null && !finished) {
          // gzip-level failures (truncated member, bad CRC) surface
          // while PULLING records — fold per-pull so prior records
          // survive, emit one loud-loss row, stop the file
          try {
            if (recs.hasNext) {
              val r = recs.next()
              pending = Row(r.warcType, r.recordId, r.warcDate, r.targetUri,
                r.contentType, r.content.length.toLong, r.content, path, -1L)
            } else {
              finished = true
              // deferred header-corrupt trailer: evaluated only after
              // the parse iterator exhausts (disjoint from the IO path)
              corrupt().foreach(off => pending = corruptRow(path, off))
              closeQuietly()
            }
          } catch {
            case _: EOFException | _: IOException =>
              finished = true
              pending = corruptRow(path, -2L)
              closeQuietly()
          }
        }
        pending != null
      }
      def next(): Row = {
        if (!hasNext) throw new NoSuchElementException("WARC record iterator")
        val r = pending; pending = null; r
      }
    }
    rows
  }

  /** Open one listed file as an executor-side Hadoop FS stream. */
  private def fsOpen(conf: org.apache.hadoop.conf.Configuration,
                     path: String): InputStream = {
    val p = try new org.apache.hadoop.fs.Path(new java.net.URI(path))
      catch {
        case _: java.net.URISyntaxException =>
          new org.apache.hadoop.fs.Path(path)
      }
    p.getFileSystem(conf).open(p)
  }

  /** Read a WARC file/glob/directory (plain `.warc` or
    * member-compressed `.warc.gz`) into the typed record frame. One
    * task per file by format necessity — see the scaladoc above.
    * Only (path, length) come from the listing source; bytes stream
    * record-by-record off an executor-side FS handle.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("path"), col("length")) // content pruned: listing only
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    files.flatMap { row =>
      val p = row.getString(0)
      fileRows(p, row.getLong(1), () => fsOpen(conf.value, p))
    }(enc)
  }

  /** Dir-watch streaming form: new `.warc`/`.warc.gz` shards landing
    * in an archive directory parse record-by-record exactly as in
    * [[read]] — the tail workflow for a live crawl's output dir. One
    * file is one task here too; `maxFilesPerTrigger` bounds a batch.
    */
  def stream(spark: SparkSession, dir: String,
             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
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
    val files = reader.load(dir).select(col("path"), col("length"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    files.flatMap { row =>
      val p = row.getString(0)
      fileRows(p, row.getLong(1), () => fsOpen(conf.value, p))
    }(enc)
  }

  /** Write one WARC record in the production layout: its own gzip
    * member. Used by the writer half and the r43 synthesis. Headers
    * encode as UTF-8 — the superset readLine decodes. `warcType`
    * distinguishes captures (`response`) from derived text
    * (`conversion` — the Common Crawl WET shape, r48). */
  def recordGz(targetUri: String, date: String, recordId: String,
               payload: Array[Byte],
               contentType: String = "text/plain",
               warcType: String = "response"): Array[Byte] = {
    val header =
      s"""WARC/1.0\r
WARC-Type: $warcType\r
WARC-Record-ID: $recordId\r
WARC-Date: $date\r
WARC-Target-URI: $targetUri\r
Content-Type: $contentType\r
Content-Length: ${payload.length}\r
\r
""".getBytes(UTF_8)
    val bos = new ByteArrayOutputStream(header.length + payload.length + 64)
    val g = new GZIPOutputStream(bos)
    g.write(header); g.write(payload); g.write("\r\n\r\n".getBytes(UTF_8))
    g.close()
    bos.toByteArray
  }

  /** Write a DataFrame of (uri, date, recordId, payload) rows as
    * multi-file `.warc.gz` under `dir` — one file per NON-EMPTY
    * partition, records as concatenated gzip members (the Common
    * Crawl layout), written executor-side through the Hadoop FS API
    * so the path scales with partitions, not the driver. Each task
    * attempt writes to an attempt-suffixed temp name and COMMITS by
    * rename, so a speculative or retried attempt can never interleave
    * bytes into a reader-visible file. `filePrefix` namespaces one
    * logical write within a shared dir — the streaming sink passes
    * `batch-<id>` so micro-batches append new shards instead of
    * clobbering each other, and a REPLAYED batch (restart recovery)
    * rewrites its own shards idempotently.
    */
  def write(df: DataFrame, dir: String, uriCol: String, dateCol: String,
            idCol: String, payloadCol: String,
            contentType: String = "text/plain",
            warcType: String = "response",
            filePrefix: String = "part"): Unit = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    df.select(col(uriCol).cast("string"), col(dateCol).cast("string"),
        col(idCol).cast("string"), col(payloadCol).cast("binary"))
      .rdd.foreachPartition { it =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val fin = new org.apache.hadoop.fs.Path(dir,
            f"$filePrefix%s-$pid%05d.warc.gz")
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f".$filePrefix%s-$pid%05d.warc.gz.attempt-${tc.taskAttemptId()}")
          val fs = fin.getFileSystem(conf.value)
          val out = fs.create(tmp, true)
          it.foreach { r =>
            out.write(recordGz(r.getString(0), r.getString(1), r.getString(2),
              r.getAs[Array[Byte]](3), contentType, warcType))
          }
          out.close()
          // last-commit-wins rename; attempts write record-set-
          // equivalent content (post-shuffle iteration order may
          // differ between attempts, so equivalence is per record
          // set, not per byte)
          if (fs.exists(fin)) fs.delete(fin, false)
          if (!fs.rename(tmp, fin)) {
            val won = fs.exists(fin) // a concurrent attempt committed
            fs.delete(tmp, false) // never strand the temp either way
            if (!won)
              throw new IOException(s"Warc.write: commit rename failed for $fin")
          }
        }
      }
  }
}
