package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Interval-union coverage (q33): overlap merges, back-to-back
  * half-open intervals fuse, gaps split, and the sweep equals a
  * reference interval-union fold.
  */
class IntervalCoverageSpec extends SparkSpec {
  import spark.implicits._

  private def tAt(minuteOfDay: Int) =
    new Timestamp(Timestamp.valueOf("2026-03-01 00:00:00").getTime
      + minuteOfDay * 60000L)

  /** Reference union length of [s, s+dur) in micros. */
  private def unionLen(startsMin: Seq[Int], durMin: Int): Long = {
    val ivs = startsMin.sorted.map(s => (s * 60000000L, (s + durMin) * 60000000L))
    var covered = 0L; var curS = -1L; var curE = -1L
    for ((s, e) <- ivs) {
      if (s > curE) { if (curE > curS) covered += curE - curS; curS = s; curE = e }
      else if (e > curE) curE = e
    }
    if (curE > curS) covered += curE - curS
    covered
  }

  private def run(startsMin: Map[String, Seq[Int]], durSec: Long) = {
    val rows = for ((k, ss) <- startsMin.toSeq; s <- ss) yield (tAt(s), k)
    Windows.intervalCoverage(rows.toDF("ts", "user_id"), "ts", "user_id", durSec)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
  }

  test("overlapping intervals count once, distant ones sum") {
    // a: 0-30 and 10-40 overlap -> 40 min; b: 0-30 and 100-130 -> 60
    val out = run(Map("a" -> Seq(0, 10), "b" -> Seq(0, 100)), durSec = 1800L)
    assert(out("a") == ((2L, 40L * 60000000L, 40L * 60000000L)))
    assert(out("b") == ((2L, 60L * 60000000L, 130L * 60000000L)))
  }

  test("back-to-back half-open intervals fuse exactly") {
    // [0,30) + [30,60): net delta 0 at minute 30, one covered hour
    val out = run(Map("k" -> Seq(0, 30)), durSec = 1800L)
    assert(out("k") == ((2L, 3600000000L, 3600000000L)))
  }

  test("the sweep equals a reference interval-union fold on messy input") {
    val starts = Seq(3, 0, 7, 7, 22, 23, 55, 90, 91, 200)
    val out = run(Map("m" -> starts), durSec = 600L) // 10-minute intervals
    val want = unionLen(starts, 10)
    assert(out("m")._2 == want, s"got ${out("m")._2} want $want")
    assert(out("m")._1 == starts.length.toLong)
  }

  test("bad duration fails loudly") {
    val df = Seq((tAt(0), "x")).toDF("ts", "user_id")
    intercept[IllegalArgumentException] {
      Windows.intervalCoverage(df, "ts", "user_id", 0L)
    }
  }
}
