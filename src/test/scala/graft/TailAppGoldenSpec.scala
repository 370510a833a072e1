package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.Formatters

/** Golden-parity differential vs the reference (r15 verdict task 7):
  * replay the reference README's own example invocation pieces
  * (README.md:20–47 — the -r typed regex, the -F filter, the
  * table/raw/rawv formatters) and pin BYTE-IDENTICAL output against
  * blocks derived from the README's printed results and the
  * formatter code (sink/format.go). Cases 1–4 are the README's four
  * query-result blocks verbatim.
  */
class TailAppGoldenSpec extends SparkSpec {
  import spark.implicits._

  // the README's exact query text (README.md:47)
  private val readmeSql = "select count(1) from t0 where time > 12275"

  private def countBlock(n: Long): String =
    Formatters.format(Seq(n).toDF("count(1)"), "table", Some(readmeSql))

  test("golden 1-4: the README's four windowed count(1) blocks, byte-identical") {
    // README.md:55-85 prints these four results across four windows
    for (n <- Seq(71L, 86L, 81L, 63L)) {
      val want =
        s"""Run sql `select count(1) from t0 where time > 12275`:
           |+----------+
           || COUNT(1) |
           |+----------+
           || $n       |
           |+----------+
           |""".stripMargin
      assert(countBlock(n) == want, s"n=$n\n${countBlock(n)}")
    }
  }

  // the README's -r pattern (README.md:29), verbatim
  private val readmeR =
    """.+ (?P<method__str>GETM) (?P<status__str>SUCC) .+7710 (?P<time__int>[0-9]+) .+"""

  test("golden 5: the README -r regex parses a matching line to the typed row") {
    val lines = Seq(
      "2024/04/12 22:47:42.506277 GETM SUCC localhost:7710 12276 us",
      "2024/04/12 22:47:43.000001 POST FAIL localhost:7710 9 us")
      .toDF("value")
    val out = sources.LogSource.parse(lines, readmeR)
    assert(out.schema("method").dataType.typeName == "string")
    assert(out.schema("time").dataType.typeName == "long")
    val rows = out.select("method", "status", "time").collect()
    // the POST/FAIL line does not match the pattern and must drop
    assert(rows.toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      == Seq(("GETM", "SUCC", 12276L)))
  }

  test("golden 6: the README -F filter keeps only time > 10000") {
    val lines = Seq(
      "x GETM SUCC localhost:7710 12276 us",
      "x GETM SUCC localhost:7710 605 us").toDF("value")
    val out = sources.LogSource.parse(lines, readmeR).filter(expr("time > 10000"))
    assert(out.select("time").collect().map(_.getLong(0)).toSeq == Seq(12276L))
  }

  test("golden 7: raw formatter bytes (RawPrintFormatter horizontal)") {
    val df = Seq((1704067200L, 2L), (1704067260L, 1L)).toDF("window_start", "n")
    assert(Formatters.format(df, "raw") ==
      "window_start, n\n" +
        "-------------------------------\n" +
        "1704067200, 2\n1704067260, 1\n\n")
  }

  test("golden 8: rawv formatter bytes (RawPrintFormatter vertical)") {
    val df = Seq(("GETM", 12276L)).toDF("method", "time")
    assert(Formatters.format(df, "rawv") ==
      "*********************\n" +
        "method: GETM\ntime: 12276\n" +
        "*********************\n\n")
  }

  test("golden 9: NULL cells render as the literal NULL (format.go:66)") {
    val df = Seq((Some("a"), None: Option[java.lang.Long])).toDF("k", "v")
    assert(Formatters.format(df, "table", Some("q")) ==
      "Run sql `q`:\n+---+------+\n| K | V    |\n+---+------+\n| a | NULL |\n+---+------+\n")
  }

  test("golden 10: empty result sets keep their frame (header-only table, raw rule)") {
    val df = Seq((1L, 1L)).toDF("count(1)", "x").filter(lit(false))
      .select(col("count(1)"))
    assert(Formatters.format(df, "table", Some(readmeSql)) ==
      s"Run sql `$readmeSql`:\n+----------+\n| COUNT(1) |\n+----------+\n+----------+\n")
    assert(Formatters.format(df, "raw") ==
      "count(1)\n-------------------------------\n\n")
  }

  test("golden 11: end-to-end --once run emits the README-shaped table block") {
    spark.sparkContext
    val dir = Files.createTempDirectory("graft-golden").toFile
    val ckpt = Files.createTempDirectory("graft-golden-ckpt").toFile
    Files.write(new java.io.File(dir, "svc.log").toPath,
      Seq(
        "2024-01-01 00:00:10 GETM SUCC localhost:7710 12276 us",
        "2024-01-01 00:00:20 GETM SUCC localhost:7710 12300 us",
        "2024-01-01 00:00:30 GETM SUCC localhost:7710 605 us")
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    TailApp.runCli(Array(
      "--dir", dir.getAbsolutePath,
      "--pattern",
      """(?P<ts__date>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) (?P<method__str>GETM) (?P<status__str>SUCC) .+7710 (?P<time__int>[0-9]+) .+""",
      "--filter", "time > 10000",
      "--window", "60", "--ts-field", "ts", "--format", "table",
      "--checkpoint", ckpt.getAbsolutePath, "--once",
      "--sql", readmeSql),
      sink = s => captured.add(s), stopSparkOnExit = false)
    val blocks = captured.toArray(Array.empty[String]).toSeq
    assert(blocks.nonEmpty, "no sink output")
    // one 00:00 window, two rows past the filter
    val want =
      s"""Run sql `$readmeSql`:
         |+----------+
         || COUNT(1) |
         |+----------+
         || 2        |
         |+----------+
         |""".stripMargin
    assert(blocks.contains(want), blocks.mkString("<<<", ">>>\n<<<", ">>>"))
  }

  test("golden 12: the -o format selector rejects unknown names loudly (cmd/query.go)") {
    val df = Seq(1L).toDF("n")
    intercept[IllegalArgumentException](Formatters.format(df, "csv"))
  }
}
