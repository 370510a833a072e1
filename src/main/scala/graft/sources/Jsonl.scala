package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) ingestion — the format raw crawl
  * dumps actually arrive in ahead of everything else this library
  * does. Parsing is `from_json` with an EXPLICIT caller schema
  * (schema inference over 100 TB is a full extra pass and a
  * correctness trap — a field that is long in one shard and string in
  * another infers differently per shard), PERMISSIVE mode, and LOUD
  * corrupt-record accounting: a line that fails to parse keeps its
  * raw text in `_corrupt` instead of vanishing — silent row loss at
  * ingestion is unrecoverable downstream, so the caller decides
  * whether to quarantine or fail.
  *
  * Shape at scale: one narrow row-local pass (from_json is a codegen
  * expression), no shuffle; corrupt accounting is a column, not a
  * filter, so healthy and corrupt rows ride the same scan.
  *
  * The r41 query pins the round-trip identity: to_json(row) parsed
  * back equals the row, bit for bit, through JSON string escaping —
  * the same format(parse(x)) == x oracle relation the regex line
  * parser (r01) uses.
  */
object Jsonl {

  /** Format rows as JSONL lines (the write half; embedded newlines
    * escape to \n so one row is always one line). */
  def toJsonl(df: DataFrame, cols: Column*): DataFrame =
    df.select(to_json(struct(cols: _*)).as("value"))

  /** Parse JSONL lines under an explicit schema. Output columns: the
    * schema's fields plus `_corrupt` (the raw line when the object
    * failed to parse, null otherwise). PERMISSIVE semantics, with the
    * caveat Spark's from_json actually implements: malformed JSON
    * marks the row corrupt, AND a type-mismatched FIELD inside valid
    * JSON also populates `_corrupt` with the raw line (partial-result
    * parse — the well-typed fields still come through). Callers
    * bucketing on `_corrupt` therefore quarantine type-drifted rows
    * alongside malformed ones; JsonlSpec pins both behaviors.
    */
  def parse(lines: DataFrame, schema: StructType,
            lineCol: String = "value"): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "Jsonl.parse: _corrupt is reserved for the corrupt-record column")
    // PERMISSIVE from_json yields an all-null struct for malformed
    // input (not a null struct), so corrupt detection needs the
    // dedicated corrupt-record column in the parse schema
    val full = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    val parsed = lines.select(
      from_json(col(lineCol), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("_j"))
    parsed.select(
      (schema.fieldNames.toSeq :+ "_corrupt")
        .map(f => col("_j").getField(f).as(f)): _*)
  }

  /** Compressed-file extensions Hadoop text input CANNOT split: one
    * such file is one task regardless of cluster size. (bzip2 is
    * block-splittable and absent on purpose.) */
  private val Unsplittable =
    Seq(".gz", ".zst", ".zstd", ".deflate", ".lz4", ".snappy")

  /** Read a JSONL file/glob/directory — plain or compressed (the
    * codec resolves from the file extension, the way crawl dumps
    * actually arrive) — and parse under the explicit schema via
    * [[parse]].
    *
    * Scale guard: a gzip/zstd file is NOT splittable, so a giant
    * compressed file silently serializes its share of the scan into
    * one task — on a 1000-executor cluster that is a 1000× slowdown
    * dressed up as a working job. If the LARGEST unsplittable file
    * exceeds `unsplittableCap` bytes AND holds the majority of the
    * scan's bytes (a tiny sidecar file must not mask the degenerate
    * shape), this fails loudly with the fix (shard the dump, or
    * recompress splittable) instead of running the plan. Many
    * similar-sized compressed shards are the correct layout and pass
    * untouched — file-grain parallelism is what the guard protects.
    */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
                schema: StructType,
                unsplittableCap: Long = 256L << 20): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // enumerate what the text reader will see (dir → children, glob → matches)
    val stats = {
      val globbed = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      globbed.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }.filterNot(st => st.getPath.getName.startsWith("_") ||
        st.getPath.getName.startsWith("."))
    }
    val unsplittable = stats.filter(st =>
      Unsplittable.exists(st.getPath.getName.toLowerCase.endsWith))
    // the degenerate shape is "one compressed file dominates the
    // scan": a giant .gz serializes ITS share into one task no matter
    // how many sidecar files ride along, so the guard fires when the
    // LARGEST unsplittable file both exceeds the cap and holds the
    // majority of the scan bytes. A dir of many same-sized shards —
    // each possibly over the cap — parallelizes at file grain and
    // passes: parallelism, not file size, is what the guard protects.
    val total = stats.map(_.getLen).sum
    val biggest = unsplittable.maxByOption(_.getLen)
    biggest.filter(b => b.getLen > unsplittableCap && b.getLen * 2 > total)
      .foreach { b =>
        throw new IllegalArgumentException(
          s"Jsonl.readJsonl: ${b.getPath.getName} (${b.getLen} bytes > cap " +
          s"$unsplittableCap) is unsplittable and holds the majority of " +
          s"$path's ${total} scan bytes — that share of the scan would " +
          "serialize into ONE task. Shard the dump into multiple files or " +
          "recompress with a splittable layout, or raise unsplittableCap " +
          "if this is intended.")
      }
    parse(spark.read.textFile(path).toDF("value"), schema)
  }

  /** JSONL over the byte-offset single-file tail (r16 verdict
    * task 6): the r41 explicit-schema corrupt-accounting parse
    * applied to the follow-file stream — tailing a GROWING
    * crawl-dump JSONL is the reference's whole point, and JSONL
    * landed batch-only in r16. Same checkpointed-offset /
    * line-boundary / rotation-reopen semantics as
    * [[LogSource.followFile]]; malformed lines surface in `_corrupt`
    * exactly as in batch, so a stream over any prefix of a file
    * equals the batch parse of that prefix (TailStreamSpec pins it).
    */
  def follow(spark: org.apache.spark.sql.SparkSession, path: String,
             schema: StructType, seekToEnd: Boolean = false,
             maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    var reader = spark.readStream.format("follow-file")
      .option("path", path).option("seekToEnd", seekToEnd.toString)
    maxBytesPerTrigger.foreach(m =>
      reader = reader.option("maxBytesPerTrigger", m.toString))
    parse(reader.load(), schema)
  }

  /** Directory-watch streaming form: new JSONL shards appearing in a
    * dump directory parse under the same explicit schema + corrupt
    * accounting. Compressed shards decode by extension exactly as in
    * [[readJsonl]] (the text source shares the codec factory) — but
    * the unsplittable-file guard is a batch-side check; a streaming
    * dir of many small .gz shards is the intended layout.
    */
  def stream(spark: org.apache.spark.sql.SparkSession, dir: String,
             schema: StructType,
             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var reader = spark.readStream
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    parse(reader.text(dir), schema)
  }

  /** Does this Spark/Hadoop build actually decode `.zst` text files?
    * The class is always present; the native binding often is not —
    * probe by round-tripping one tiny file instead of trusting
    * class-loading. Used to gate the zstd leg of the compressed
    * ingestion path (env-dependent by contract; .gz is always on).
    */
  def zstdAvailable(spark: org.apache.spark.sql.SparkSession): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    try {
      val factory = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
      val p = new org.apache.hadoop.fs.Path("probe.zst")
      val codec = factory.getCodec(p)
      if (codec == null) return false
      val bytes = new java.io.ByteArrayOutputStream()
      val out = codec.createOutputStream(bytes)
      out.write("{\"probe\":1}\n".getBytes("UTF-8")); out.close()
      val in = codec.createInputStream(
        new java.io.ByteArrayInputStream(bytes.toByteArray))
      val buf = new Array[Byte](64); val n = in.read(buf); in.close()
      n > 0 && new String(buf, 0, n, "UTF-8").startsWith("{\"probe\"")
    } catch { case _: Throwable => false }
  }
}
