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
}
