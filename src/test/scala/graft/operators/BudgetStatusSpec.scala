package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SLO budget status (r31): exact hand-computed budget math on
  * constructed traffic, the no-evidence projection rule, and the
  * blown-budget clamp.
  */
class BudgetStatusSpec extends SparkSpec {
  import spark.implicits._

  private def at(h: Int, i: Int) =
    new Timestamp((h * 3600L + i + 1) * 1000L)

  test("steady burn 1.0 consumes elapsed/period of the budget") {
    // 100 hours x 100 events, 0.5% errors = burn exactly 1.0 at a
    // 99.5% SLO: used = elapsed/period = 100/720, exhaustion in the
    // remaining 620 budget-hours at the recent (identical) pace
    val rows2 = for (h <- 0 until 100; i <- 0 until 100)
      yield (at(h, i), if (i < 50 && h == 0) "error" else "view")
    val out = Windows.budgetStatus(rows2.toDF("ts", "event_type"), "ts",
        col("event_type") === "error", slo = 0.995,
        periodHours = 720, recentHours = 168)
      .collect().head
    assert(out.getLong(0) == 720L && out.getLong(1) == 100L, out)
    assert(out.getLong(2) == 10000L && out.getLong(3) == 50L, out)
    assert(out.getDouble(4) == 0.005, out)
    assert(math.abs(out.getDouble(5) - 100.0 / 720.0) < 1e-6, out)
    assert(out.getDouble(6) == 1.0, out) // recent window sees the same rate
    assert(math.abs(out.getDouble(7) - (1.0 - 100.0 / 720.0) * 720.0) < 1e-4, out)
    assert(!out.getBoolean(8), out)
  }

  test("an error-free recent window yields no projection") {
    // errors only in the first 10 hours; the trailing-24h window is
    // clean -> recent_burn 0, hours_to_exhaustion null
    val rows = for (h <- 0 until 100; i <- 0 until 50)
      yield (at(h, i), if (h < 10 && i < 5) "error" else "view")
    val out = Windows.budgetStatus(rows.toDF("ts", "event_type"), "ts",
        col("event_type") === "error", slo = 0.995,
        periodHours = 720, recentHours = 24)
      .collect().head
    assert(out.getDouble(6) == 0.0, out)
    assert(out.isNullAt(7), out)
    assert(out.getDouble(5) > 0.0 && !out.getBoolean(8), out)
  }

  test("a blown budget reports exhausted with a zero clamp") {
    // 24 hours at 20% errors: used = 40 x 24/720 = 1.333 > 1
    val rows = for (h <- 0 until 24; i <- 0 until 100)
      yield (at(h, i), if (i < 20) "error" else "view")
    val out = Windows.budgetStatus(rows.toDF("ts", "event_type"), "ts",
        col("event_type") === "error", slo = 0.995,
        periodHours = 720, recentHours = 168)
      .collect().head
    assert(out.getBoolean(8), out)
    assert(out.getDouble(7) == 0.0, out)
    assert(math.abs(out.getDouble(5) - 40.0 * 24.0 / 720.0) < 1e-6, out)
  }

  test("bad params fail loudly") {
    val df = Seq((at(0, 0), "view")).toDF("ts", "event_type")
    intercept[IllegalArgumentException] {
      Windows.budgetStatus(df, "ts", col("event_type") === "error", 1.0)
    }
    intercept[IllegalArgumentException] {
      Windows.budgetStatus(df, "ts", col("event_type") === "error", 0.99,
        periodHours = 10, recentHours = 20)
    }
  }
}
