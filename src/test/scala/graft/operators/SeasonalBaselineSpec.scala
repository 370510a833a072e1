package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hour-of-week seasonal baseline (r27): slot-exact means (zero-event
  * calendar hours deflate them), the weekly-shape comparison, and
  * drop/new detection through the full-outer sides.
  */
class SeasonalBaselineSpec extends SparkSpec {
  import spark.implicits._

  // 2024-01-01 00:00 UTC is epoch-hour 473352; 473352 % 168 = 96, so
  // hour-of-week of (day d, hour h) is (96 + 24*d + h) % 168
  private val howBase = 96
  private def ts(day: Int, hour: Int, i: Int) =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:${i % 60}%02d")

  test("the baseline is per-slot and zero hours deflate it; drops surface") {
    // anchor key "z" pins the GLOBAL bounds to exactly 3 history
    // weeks [Jan 1, Jan 22) + one last week: h0 = Jan 1 00:00,
    // hx = Jan 28 23:00, hb = hx-167 = Jan 22 00:00. Spike slot
    // (day 1, hour 9): history 6, 0, 3 -> mean 3.0; last week 12 ->
    // ratio (12+1)/(3+1) = 3.25. Drop slot (day 2, hour 9): steady
    // 4/week in history, ZERO last week -> ratio 0.2.
    val rows =
      Seq((ts(0, 0, 0), "z"), (ts(27, 23, 0), "z")) ++
      (1 to 6).map(i => (ts(1, 9, i), "k")) ++          // week 0
      (1 to 3).map(i => (ts(15, 9, i), "k")) ++         // week 2 (week 1 empty)
      (1 to 12).map(i => (ts(22, 9, i), "k")) ++        // LAST week
      Seq(0, 7, 14).flatMap(w => (1 to 4).map(i => (ts(2 + w, 9, i), "k")))
    val out = Windows.seasonalBaseline(rows.toDF("ts", "event_type"), "ts",
        "event_type")
      .filter(org.apache.spark.sql.functions.col("key") === "k")
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5), r.getDouble(6)))
      .toMap
    val howSpike = (howBase + 24 + 9) % 168 // day offset 1, hour 9
    val (nh, sl, bm, nl, ratio) = out(howSpike.toLong)
    assert(sl == 3L && nh == 9L && bm == 3.0, out(howSpike.toLong))
    assert(nl == 12L && ratio == 3.25, out(howSpike.toLong))
    val howDrop = (howBase + 48 + 9) % 168 // day offset 2, hour 9
    val (nh2, sl2, bm2, nl2, r2) = out(howDrop.toLong)
    assert(sl2 == 3L && nh2 == 12L && bm2 == 4.0 && nl2 == 0L, out(howDrop.toLong))
    assert(r2 == 0.2, out(howDrop.toLong))
  }

  test("a corpus shorter than two weeks yields null baselines, never junk") {
    val rows = (1 to 5).map(i => (ts(0, 3, i), "k"))
    val out = Windows.seasonalBaseline(rows.toDF("ts", "event_type"), "ts",
        "event_type").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) == 0L, r)          // no history slots
      assert(r.isNullAt(4) && r.isNullAt(6), r) // baseline, ratio null
    }
  }
}
