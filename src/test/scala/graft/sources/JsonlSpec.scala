package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** JSONL ingestion (r41): malformed lines surface in _corrupt instead
  * of vanishing, a type-mismatched FIELD nulls the field (not the
  * row), and the write→read round trip is exact through JSON string
  * escaping — including embedded newlines, which must stay one line.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("malformed JSON lands in _corrupt with the raw line; valid rows parse") {
    val out = Jsonl.parse(Seq(
        """{"id": 1, "text": "ok"}""",
        """{broken""").toDF("value"), schema)
      .collect()
    assert(out.length == 2)
    val good = out.find(!_.isNullAt(0)).get
    assert(good.getLong(0) == 1L && good.getString(1) == "ok"
      && good.isNullAt(2))
    val bad = out.find(_.isNullAt(0)).get
    assert(bad.getString(2) == "{broken", bad.toString)
  }

  test("a type-mismatched field nulls the FIELD, not the row — but " +
      "DOES populate _corrupt (partial-result PERMISSIVE semantics)") {
    val out = Jsonl.parse(
      Seq("""{"id": "oops", "text": "kept"}""").toDF("value"), schema)
      .collect().head
    assert(out.isNullAt(0) && out.getString(1) == "kept")
    // pin Spark's real PERMISSIVE behavior: a valid-JSON row with one
    // mismatched field keeps its parsed fields AND carries the raw
    // line in _corrupt — an r41-style '(corrupt)' bucket therefore
    // quarantines type-drifted rows alongside malformed ones
    assert(out.getString(2) == """{"id": "oops", "text": "kept"}""",
      s"_corrupt = ${out.get(2)}")
  }

  test("round trip is exact, embedded newline stays one JSONL line") {
    val df = Seq((7L, "line one\nline two\ttab \"quoted\"")).toDF("id", "text")
    val lines = Jsonl.toJsonl(df, col("id"), col("text"))
    assert(lines.count() == 1)
    assert(!lines.head.getString(0).contains("\n"))
    val back = Jsonl.parse(lines, schema).collect().head
    assert(back.getLong(0) == 7L
      && back.getString(1) == "line one\nline two\ttab \"quoted\"")
  }

  test("the reserved _corrupt name in the caller schema is rejected") {
    intercept[IllegalArgumentException] {
      Jsonl.parse(Seq("{}").toDF("value"),
        StructType(Seq(StructField("_corrupt", StringType))))
    }
  }

  test("readJsonl decodes multi-file gzip JSONL with corrupt accounting") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-gz").toFile
    Jsonl.toJsonl(Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
        .toDF("id", "text"), col("id"), col("text"))
      .repartition(2)
      .write.mode("overwrite").option("compression", "gzip")
      .text(dir.getAbsolutePath)
    // one extra tiny gzip member holding a malformed line
    val g = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(dir, "corrupt.jsonl.gz")))
    g.write("{this is not json\n".getBytes("UTF-8")); g.close()
    val out = Jsonl.readJsonl(spark, dir.getAbsolutePath, schema).collect()
    assert(out.length == 4, out.mkString("; "))
    assert(out.count(_.isNullAt(0)) == 1) // the corrupt line
    assert(out.filter(!_.isNullAt(0)).map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(out.find(_.isNullAt(0)).get.getString(2) == "{this is not json")
  }

  test("one giant unsplittable gzip fails loudly; many small ones pass") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-one").toFile
    val f = new java.io.File(dir, "dump.jsonl.gz")
    val g = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f))
    (1 to 200).foreach(i => g.write(s"""{"id": $i, "text": "t$i"}\n""".getBytes("UTF-8")))
    g.close()
    // a single compressed file over the cap would serialize the scan
    val e = intercept[IllegalArgumentException] {
      Jsonl.readJsonl(spark, dir.getAbsolutePath, schema, unsplittableCap = 64L)
    }
    assert(e.getMessage.contains("ONE task"), e.getMessage)
    // under the cap (genuinely small dump) it reads fine
    assert(Jsonl.readJsonl(spark, dir.getAbsolutePath, schema).count() == 200L)
  }

  test("zstd leg is env-gated: probe decides, no silent failure") {
    // this build's zstd text codec is probed at runtime (the class is
    // always on the classpath; the native binding often is not). The
    // spec pins BOTH legs: available → a .zst file round-trips;
    // absent → the probe says so (and r42 stays .gz-gated, the
    // documented env-dependence)
    if (Jsonl.zstdAvailable(spark)) {
      val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-zst").toFile
      val conf = spark.sparkContext.hadoopConfiguration
      val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
        .getCodec(new org.apache.hadoop.fs.Path("x.zst"))
      val out = codec.createOutputStream(new java.io.FileOutputStream(
        new java.io.File(dir, "part.jsonl.zst")))
      out.write("""{"id": 9, "text": "zst"}""".getBytes("UTF-8")); out.write('\n')
      out.close()
      val rows = Jsonl.readJsonl(spark, dir.getAbsolutePath, schema).collect()
      assert(rows.length == 1 && rows.head.getLong(0) == 9L)
    } else {
      info("zstd codec unavailable on this build — .gz-only ingestion (documented)")
      assert(!Jsonl.zstdAvailable(spark))
    }
  }

  test("dir-watch stream: new shards parse under the same schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-stream").toFile
    java.nio.file.Files.write(new java.io.File(dir, "s0.jsonl").toPath,
      "{\"id\": 1, \"text\": \"a\"}\n".getBytes("UTF-8"))
    val q = Jsonl.stream(spark, dir.getAbsolutePath, schema,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("jsonl_dir")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsonl_dir").count() == 1L)
      // a NEW shard appears (plus one malformed line) — the watch
      // picks it up, corrupt accounting intact
      java.nio.file.Files.write(new java.io.File(dir, "s1.jsonl").toPath,
        "{\"id\": 2, \"text\": \"b\"}\n{oops\n".getBytes("UTF-8"))
      q.processAllAvailable()
      val rows = spark.table("jsonl_dir").collect()
      assert(rows.length == 3, rows.mkString("; "))
      assert(rows.count(_.isNullAt(0)) == 1)
      assert(rows.find(_.isNullAt(0)).get.getString(2) == "{oops")
    } finally q.stop()
  }

  test("a tiny sidecar file cannot mask the giant-gzip guard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-side").toFile
    val g = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(
      new java.io.File(dir, "dump.jsonl.gz")))
    (1 to 500).foreach(i => g.write(s"""{"id": $i, "text": "t$i"}\n""".getBytes("UTF-8")))
    g.close()
    java.nio.file.Files.write(new java.io.File(dir, "readme.jsonl").toPath,
      "{\"id\": 0, \"text\": \"sidecar\"}\n".getBytes("UTF-8"))
    // the giant file still dominates the scan bytes -> still rejected
    val e = intercept[IllegalArgumentException] {
      Jsonl.readJsonl(spark, dir.getAbsolutePath, schema, unsplittableCap = 64L)
    }
    assert(e.getMessage.contains("ONE task"), e.getMessage)
  }
}
