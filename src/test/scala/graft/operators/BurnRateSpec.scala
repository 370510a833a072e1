package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-window burn rate (r26): exact budget math on constructed
  * traffic, the short-window/long-window separation that makes the
  * SRE multiwindow rule work, and the page threshold.
  */
class BurnRateSpec extends SparkSpec {
  import spark.implicits._

  private def at(hourOffset: Int, minute: Int) =
    Timestamp.valueOf(f"2026-01-02 ${hourOffset}%02d:$minute%02d:00")

  test("a fast burn pages the short window but dilutes out of the long one") {
    // hours 0..23: 100 ok events/hour; final hour 23 adds 10 errors
    // (9.1% error rate in 1h -> burn 18.2 at slo 99.5% -> page;
    // 24h rate 10/2410 = 0.41% -> burn 0.83 -> quiet)
    val ok = for (h <- 0 to 23; i <- 1 to 100)
      yield (at(h, i % 60), "view")
    val errs = (1 to 10).map(i => (at(23, i), "error"))
    val df = (ok ++ errs).toDF("ts", "event_type")
    val out = Windows.burnRate(df, "ts", col("event_type") === "error",
        slo = 0.995, windowsHours = Seq(1, 24))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getBoolean(5))).toMap
    val (n1, e1, b1, p1) = out(1)
    assert(n1 == 110L && e1 == 10L, out(1))
    assert(b1 > 18.0 && b1 < 18.4 && p1, out(1))
    val (n24, e24, b24, p24) = out(24)
    assert(n24 == 2410L && e24 == 10L, out(24))
    assert(b24 < 1.0 && !p24, out(24))
  }

  test("a slow leak shows in the long window while the short one is clean") {
    // 2 errors per 100 events every hour for 24h (2% rate, burn 4 at
    // 99.5%), but the LAST hour is error-free — short window quiet,
    // long window still reports the leak
    val rows = for (h <- 0 to 23; i <- 1 to 100) yield {
      val typ = if (h < 23 && i <= 2) "error" else "view"
      (at(h, i % 60), typ)
    }
    val out = Windows.burnRate(rows.toDF("ts", "event_type"), "ts",
        col("event_type") === "error", slo = 0.995, windowsHours = Seq(1, 24))
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(out(1) == ((0L, 0.0)), out(1))
    val (e24, b24) = out(24)
    assert(e24 == 46L && b24 > 3.5, out(24))
  }

  test("bad slo and empty windows fail loudly") {
    val df = Seq((at(0, 0), "view")).toDF("ts", "event_type")
    intercept[IllegalArgumentException] {
      Windows.burnRate(df, "ts", col("event_type") === "error", 1.0, Seq(1))
    }
    intercept[IllegalArgumentException] {
      Windows.burnRate(df, "ts", col("event_type") === "error", 0.99, Nil)
    }
  }
}
