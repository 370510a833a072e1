package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Canary before/after comparison (r32): exact hand-computed
  * two-proportion z, the no-evidence null rules, and param checks.
  */
class CanarySpec extends SparkSpec {
  import spark.implicits._

  private def at(h: Int, i: Int) =
    new Timestamp((h * 3600L + i + 1) * 1000L)

  test("share shift z matches the hand-computed two-proportion statistic") {
    // before = hours 0-1 (A 80, B 20), after = hour 2 (A 50, B 50)
    val rows =
      (0 until 40).map(i => ("A", at(0, i))) ++
      (0 until 40).map(i => ("A", at(1, i))) ++
      (0 until 10).map(i => ("B", at(0, 100 + i))) ++
      (0 until 10).map(i => ("B", at(1, 100 + i))) ++
      (0 until 50).map(i => ("A", at(2, i))) ++
      (0 until 50).map(i => ("B", at(2, 100 + i)))
    val out = Windows.canaryCompare(rows.toDF("event_type", "ts"), "ts",
        "event_type", beforeHours = 2, afterHours = 1)
      .orderBy("key").collect()
    val b = out.find(_.getString(0) == "B").get
    assert(b.getLong(1) == 20L && b.getLong(2) == 50L, b)
    assert(b.getDouble(3) == 10.0 && b.getDouble(4) == 50.0, b)
    assert(b.getDouble(5) == 5.0, b) // rate ratio
    assert(b.getDouble(6) == 0.2 && b.getDouble(7) == 0.5, b)
    val p = 70.0 / 200.0
    val zExp = BigDecimal((0.5 - 0.2) / math.sqrt(p * (1.0 - p) * (1.0 / 100 + 1.0 / 100)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(b.getDouble(8) == zExp, s"$b want z=$zExp")
    // A mirrors B's shift with the opposite sign
    val a = out.find(_.getString(0) == "A").get
    assert(a.getDouble(8) == -zExp, a)
  }

  test("a key absent before gets counts but no rate ratio") {
    val rows =
      (0 until 30).map(i => ("A", at(0, i))) ++
      (0 until 30).map(i => ("A", at(1, i))) ++
      (0 until 5).map(i => ("C", at(1, 200 + i)))
    val out = Windows.canaryCompare(rows.toDF("event_type", "ts"), "ts",
        "event_type", beforeHours = 1, afterHours = 1)
      .collect()
    val c = out.find(_.getString(0) == "C").get
    assert(c.getLong(1) == 0L && c.getLong(2) == 5L, c)
    assert(c.isNullAt(5), c)           // no before evidence, no ratio
    assert(!c.isNullAt(8), c)          // the share z is still defined
  }

  test("a single-key corpus has degenerate pooled share and null z") {
    val rows = (0 until 10).map(i => ("A", at(0, i))) ++
      (0 until 20).map(i => ("A", at(1, i)))
    val out = Windows.canaryCompare(rows.toDF("event_type", "ts"), "ts",
        "event_type", beforeHours = 1, afterHours = 1).collect()
    assert(out.length == 1 && out.head.isNullAt(8), out.mkString)
    assert(out.head.getDouble(6) == 1.0 && out.head.getDouble(7) == 1.0, out.head)
  }

  test("bad windows fail loudly") {
    val df = Seq(("A", at(0, 0))).toDF("event_type", "ts")
    intercept[IllegalArgumentException] {
      Windows.canaryCompare(df, "ts", "event_type", 0, 1)
    }
  }
}
