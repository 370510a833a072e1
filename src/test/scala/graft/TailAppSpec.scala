package graft

class TailAppSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("properties config translates to per-source configs with shared window") {
    val p = new java.util.Properties()
    p.setProperty("window.size_seconds", "30")
    p.setProperty("window.slide_seconds", "10")
    p.setProperty("window.ts_field", "ts")
    p.setProperty("watermark", "2 minutes")
    p.setProperty("sql", "SELECT 1 FROM t0")
    p.setProperty("format", "raw")
    p.setProperty("source.0.dir", "/logs/a")
    p.setProperty("source.0.pattern", "(?P<ts__date>\\S+)")
    p.setProperty("source.0.filter", "x > 1")
    p.setProperty("source.0.max_files_per_trigger", "7")
    p.setProperty("source.0.do_not_tail", "true")
    p.setProperty("source.0.throttle.max_elements_in_period", "100")
    p.setProperty("source.0.throttle.period_seconds", "10")
    p.setProperty("source.1.dir", "/logs/b")
    p.setProperty("source.1.pattern", "(?P<ts__date>\\S+) b")
    p.setProperty("source.1.throttle.max_elements_in_period", "0") // 0 = off
    val cfgs = TailApp.fromProperties(p)
    assert(cfgs.size == 2)
    val c0 = cfgs.head
    assert(c0.dir == "/logs/a" && c0.filter.contains("x > 1")
      && c0.maxFilesPerTrigger.contains(7) && c0.windowSizeSec == 30L
      && c0.slideSec.contains(10L) && c0.tsField.contains("ts")
      && c0.watermarkDelay == "2 minutes" && c0.sql.contains("SELECT 1 FROM t0")
      && c0.format == "raw")
    assert(c0.doNotTail && c0.throttleMax.contains(100)
      && c0.throttlePeriodSec.contains(10L))
    assert(cfgs(1).dir == "/logs/b" && cfgs(1).filter.isEmpty
      && cfgs(1).windowSizeSec == 30L)
    // reference config.yaml defaults: seek to end, no throttle
    assert(!cfgs(1).doNotTail && cfgs(1).throttleMax.isEmpty)
  }

  test("config without sources is rejected") {
    val p = new java.util.Properties()
    p.setProperty("window.size_seconds", "30")
    intercept[RuntimeException](TailApp.fromProperties(p))
  }

  test("--config combined with a non-overridable flag fails fast") {
    // --window can only come from the file in config mode; silently
    // ignoring it would mislead the operator. Fires before file IO, so
    // a nonexistent path proves the precedence.
    val e = intercept[IllegalArgumentException](
      TailApp.main(Array("--config", "/nonexistent.conf", "--window", "5")))
    assert(e.getMessage.contains("--window"))
  }

  test("repeated --dir/--pattern/--filter translate to N source configs (reference slice flags)") {
    val a = Map(
      "dir" -> Seq("/logs/a", "/logs/b"),
      "pattern" -> Seq("(?P<ts__date>\\S+) a", "(?P<ts__date>\\S+) b"),
      "filter" -> Seq("x > 1", ""),
      "window" -> Seq("30"), "ts-field" -> Seq("ts"), "format" -> Seq("raw"))
    val cfgs = TailApp.fromRepeatedFlags(a, seekEnd = false)
    assert(cfgs.size == 2)
    assert(cfgs(0).dir == "/logs/a" && cfgs(0).pattern.endsWith(" a")
      && cfgs(0).filter.contains("x > 1"))
    // an empty filter slot means "no filter for this source"
    assert(cfgs(1).dir == "/logs/b" && cfgs(1).filter.isEmpty)
    assert(cfgs.forall(c => c.windowSizeSec == 30L && c.tsField.contains("ts")
      && c.format == "raw" && c.doNotTail))
    assert(TailApp.fromRepeatedFlags(a, seekEnd = true).forall(!_.doNotTail))
  }

  test("pattern/filter counts must match dir count, like the reference's NewCfg") {
    val base = Map("dir" -> Seq("/a", "/b"), "pattern" -> Seq("p"))
    val e1 = intercept[IllegalArgumentException](
      TailApp.fromRepeatedFlags(base, seekEnd = false))
    assert(e1.getMessage.contains("match with files"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](TailApp.fromRepeatedFlags(
      base + ("pattern" -> Seq("p", "q"), "filter" -> Seq("f")), seekEnd = false))
    assert(e2.getMessage.contains("filters num"), e2.getMessage)
  }

  test("--throttlers values parse like the reference's parseThrottleOpt") {
    assert(TailApp.parseThrottleOpt("100:10:0").contains((100, 10L)))
    assert(TailApp.parseThrottleOpt("5:60").contains((5, 60L))) // BUFF optional here
    assert(TailApp.parseThrottleOpt("").isEmpty)       // explicit unthrottled slot
    assert(TailApp.parseThrottleOpt("0:10:0").isEmpty) // 0 max = off
    assert(TailApp.parseThrottleOpt("100:0:0").isEmpty) // 0 period = off
    val e1 = intercept[IllegalArgumentException](TailApp.parseThrottleOpt("100"))
    assert(e1.getMessage.contains("MAX_ELE:PERIOD_SEC"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](TailApp.parseThrottleOpt("a:10:0"))
    assert(e2.getMessage.contains("max eles"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](TailApp.parseThrottleOpt("1:2:x"))
    assert(e3.getMessage.contains("buffsize"), e3.getMessage)
  }

  test("repeated --throttlers pair 1:1 with --dir and match the config-file form") {
    val a = Map(
      "dir" -> Seq("/logs/a", "/logs/b"),
      "pattern" -> Seq("(?P<ts__date>\\S+) a", "(?P<ts__date>\\S+) b"),
      "throttlers" -> Seq("100:10:0", ""),
      "window" -> Seq("30"), "ts-field" -> Seq("ts"))
    val cfgs = TailApp.fromRepeatedFlags(a, seekEnd = false)
    assert(cfgs(0).throttleMax.contains(100)
      && cfgs(0).throttlePeriodSec.contains(10L))
    assert(cfgs(1).throttleMax.isEmpty && cfgs(1).throttlePeriodSec.isEmpty)
    // parity: the same throttle through the properties form lands in
    // the identical Config fields
    val p = new java.util.Properties()
    p.setProperty("window.size_seconds", "30")
    p.setProperty("window.ts_field", "ts")
    p.setProperty("source.0.dir", "/logs/a")
    p.setProperty("source.0.pattern", "(?P<ts__date>\\S+) a")
    p.setProperty("source.0.throttle.max_elements_in_period", "100")
    p.setProperty("source.0.throttle.period_seconds", "10")
    p.setProperty("source.0.throttle.buffer_size", "0") // validated, ignored
    val pc = TailApp.fromProperties(p).head
    assert(pc.throttleMax == cfgs(0).throttleMax
      && pc.throttlePeriodSec == cfgs(0).throttlePeriodSec)
    // slice-count mismatch rejected loudly, like the reference's NewCfg
    val e = intercept[IllegalArgumentException](TailApp.fromRepeatedFlags(
      a + ("throttlers" -> Seq("1:2:3")), seekEnd = false))
    assert(e.getMessage.contains("throttlers num"), e.getMessage)
    // malformed buffer_size fails loudly instead of silently dropping
    p.setProperty("source.0.throttle.buffer_size", "big")
    val e2 = intercept[IllegalArgumentException](TailApp.fromProperties(p))
    assert(e2.getMessage.contains("buffer_size"), e2.getMessage)
  }

  test("a non-repeatable flag given twice is rejected, not last-wins") {
    val e = intercept[IllegalArgumentException](TailApp.main(Array(
      "--dir", "/a", "--pattern", "p", "--window", "5", "--window", "6")))
    assert(e.getMessage.contains("--window given 2 times"), e.getMessage)
  }
}

/** End-to-end CLI runs (real streams over temp dirs, shared session). */
class TailAppCliSpec extends SparkSpec {
  import java.nio.file.Files

  private val pattern =
    """(?P<ts__date>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) (?P<level__str>\w+) (?P<ms__int>\d+)"""

  test("two repeated --dir sources join per window through the CLI, no config file") {
    spark.sparkContext // force the shared session up before runCli getOrCreate's
    val dirs = (0 to 1).map(_ => Files.createTempDirectory("graft-cli").toFile)
    val ckpt = Files.createTempDirectory("graft-cli-ckpt").toFile
    def writeLog(dir: java.io.File, name: String, lines: String*): Unit =
      Files.write(new java.io.File(dir, name).toPath,
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    writeLog(dirs(0), "a.log",
      "2024-01-01 00:00:10 INFO 5",
      "2024-01-01 00:00:20 WARN 9")
    writeLog(dirs(1), "b.log",
      "2024-01-01 00:00:30 WARN 4")
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    TailApp.runCli(Array(
      "--dir", dirs(0).getAbsolutePath, "--pattern", pattern,
      "--dir", dirs(1).getAbsolutePath, "--pattern", pattern,
      "--window", "60", "--ts-field", "ts", "--format", "raw",
      "--checkpoint", ckpt.getAbsolutePath, "--once",
      "--sql", """SELECT t0.window_start, t0.n AS n0, t1.n AS n1 FROM
                    (SELECT window_start, count(*) AS n FROM t0 GROUP BY 1) t0
                  JOIN
                    (SELECT window_start, count(*) AS n FROM t1 GROUP BY 1) t1
                  USING (window_start)"""),
      sink = s => captured.add(s), stopSparkOnExit = false)
    val out = String.join("\n", captured).split("\n").filter(_.nonEmpty).toSeq
    // one 00:00 window: 2 rows from source 0 joined to 1 row from source 1
    assert(out.exists(_.endsWith(",2,1")), out.toString)
  }

  test("--throttlers caps admissions per period through the CLI (reference -t)") {
    spark.sparkContext
    val dir = Files.createTempDirectory("graft-cli-thr").toFile
    val ckpt = Files.createTempDirectory("graft-cli-thr-ckpt").toFile
    Files.write(new java.io.File(dir, "a.log").toPath,
      Seq(
        "2024-01-01 00:00:10 INFO 5",
        "2024-01-01 00:00:20 WARN 9",
        "2024-01-01 00:00:30 WARN 4").mkString("", "\n", "\n").getBytes("UTF-8"))
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    TailApp.runCli(Array(
      "--dir", dir.getAbsolutePath, "--pattern", pattern,
      "--window", "60", "--ts-field", "ts", "--format", "raw",
      "--throttlers", "2:3600:0",
      "--checkpoint", ckpt.getAbsolutePath, "--once"),
      sink = s => captured.add(s), stopSparkOnExit = false)
    val out = String.join("\n", captured).split("\n").filter(_.nonEmpty).toSeq
    // one 00:00 window; 3 lines arrived, the throttler admitted 2
    assert(out.exists(_.endsWith(",2")), out.toString)
  }

  test("--log-level flag reaches the Spark context (reference -l/--log-level)") {
    // Mutates the JVM-global log4j root logger by design (that IS the
    // flag's observable effect; one JVM = one root logger). Safe here
    // because Test/parallelExecution := false runs suites serially,
    // and the finally restores the EXACT prior level (not an assumed
    // default) so no WARN window leaks past this test even if an
    // earlier suite changed the baseline.
    def rootLevel = org.apache.logging.log4j.LogManager.getRootLogger
      .asInstanceOf[org.apache.logging.log4j.core.Logger].getLevel
    spark.sparkContext
    val prior = rootLevel
    val dir = Files.createTempDirectory("graft-cli-ll").toFile
    val ckpt = Files.createTempDirectory("graft-cli-ll-ckpt").toFile
    try {
      TailApp.runCli(Array(
        "--dir", dir.getAbsolutePath, "--pattern", pattern,
        "--window", "60", "--log-level", "warn",
        "--checkpoint", ckpt.getAbsolutePath, "--once"),
        sink = _ => (), stopSparkOnExit = false)
      assert(rootLevel == org.apache.logging.log4j.Level.WARN, rootLevel.toString)
    } finally spark.sparkContext.setLogLevel(prior.name())
  }
}
