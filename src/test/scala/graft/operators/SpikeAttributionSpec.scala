package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Spike attribution (r33): the planted driver segment reads high
  * lift/z, stable segments read ~1, a spike-only segment gets the
  * null-lift new-traffic verdict.
  */
class SpikeAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def at(h: Int, i: Int) =
    new Timestamp((h * 3600L + i + 1) * 1000L)

  test("the planted segment carries the spike; stable traffic reads flat") {
    // 30 steady hours (A 90/h, B 10/h), then hour 30 spikes: B adds
    // 500 events — B drove it, A's volume never changed
    val rows =
      (0 until 31).flatMap(h => (0 until 90).map(i => ("A", at(h, i)))) ++
      (0 until 31).flatMap(h => (0 until 10).map(i => ("B", at(h, 200 + i)))) ++
      (0 until 500).map(i => ("B", at(30, 300 + i))) ++
      (0 until 20).map(i => ("C", at(30, 900 + i))) // spike-only segment
    val out = Windows.spikeAttribution(rows.toDF("event_type", "ts"), "ts",
        "event_type").orderBy("key").collect()
    val a = out.find(_.getString(0) == "A").get
    val b = out.find(_.getString(0) == "B").get
    val c = out.find(_.getString(0) == "C").get
    // B: share jumps from 10% to ~82% of the anomalous hour
    assert(b.getDouble(5) > 5.0, b)           // lift
    assert(b.getDouble(7) > 10.0, b)          // z
    assert(b.getDouble(6) > 400.0, b)         // excess events
    // A: its share COLLAPSED in the spike hour (same volume, bigger
    // denominator) — lift well below 1, negative excess
    assert(a.getDouble(5) < 0.3 && a.getDouble(6) < -300.0, a)
    // C exists only in the spike: no normal evidence, null lift,
    // positive excess
    assert(c.isNullAt(5) && c.getDouble(6) > 0.0, c)
    assert(c.getLong(2) == 0L, c)
  }

  test("a corpus with no anomalous hours attributes nothing") {
    val rows = (0 until 40).flatMap(h =>
      (0 until 50).map(i => ("A", at(h, i))) ++
        (0 until 50).map(i => ("B", at(h, 100 + i))))
    val out = Windows.spikeAttribution(rows.toDF("event_type", "ts"), "ts",
      "event_type").collect()
    assert(out.isEmpty, out.mkString)
  }
}
