package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Mann–Kendall + Theil–Sen (r36): hand-checked S/z/slope, the
  * spike-immunity that separates Sen from least squares, and the
  * degenerate NULLs.
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def events(rates: Seq[(Long, Int)], key: String = "k") =
    rates.flatMap { case (h, r) =>
      Seq.fill(r)((key, new Timestamp(h * 3600L * 1000L)))
    }.toDF("k", "ts")

  test("hand-computed monotone series: S = n(n-1)/2, slope exact") {
    // counts 1,2,3,4 at hours 0..3: every pair ascends -> S = 6;
    // all pairwise slopes are exactly 1.0 events/hour -> median 1.0;
    // z = (6-1)/sqrt((4*3*13 - sum t(t-1)(2t+5))/18), no ties -> tt=0
    // var = 156/18 = 8.6667, z = 5/2.943920 = 1.698416
    val df = events(Seq((0L, 1), (1L, 2), (2L, 3), (3L, 4)))
    val row = Windows.trendTest(df, "ts", "k").collect().head
    assert(row.getLong(1) == 4L && row.getLong(2) == 6L, row.toString)
    assert(row.getDouble(4) == 1.0, "every pairwise slope is exactly 1")
    assert(row.getDouble(3) == 1.698416, row.toString)
  }

  test("one massive spike cannot move the Theil-Sen slope off the trend") {
    // steady +1/hour trend with a 1000x spike mid-series: the median
    // pairwise slope stays on the trend (a least-squares fit would
    // be dragged far off it)
    val steady = (0L until 20L).map(h => (h, 10 + h.toInt))
    val spiked = steady.updated(10, (10L, 10000))
    val row = Windows.trendTest(events(spiked), "ts", "k").collect().head
    assert(math.abs(row.getDouble(4) - 1.0) <= 0.1,
      s"sen_slope=${row.getDouble(4)} must stay on the +1/hour trend")
  }

  test("flat series: S = 0 scores z = 0; tiny all-tied series scores NULL") {
    val flat = events((0L until 10L).map(h => (h, 7)))
    val r1 = Windows.trendTest(flat, "ts", "k").collect().head
    // all pairs tie: S = 0 and the tie term kills the variance
    assert(r1.getLong(2) == 0L && r1.isNullAt(3), r1.toString)
    // time-symmetric 5,9,9,5: up-pairs and down-pairs cancel (S = 0)
    // but the 5/9 mix keeps variance > 0 -> z = 0.0 exactly
    val alt = events(Seq((0L, 5), (1L, 9), (2L, 9), (3L, 5)))
    val r2 = Windows.trendTest(alt, "ts", "k").collect().head
    assert(r2.getLong(2) == 0L && !r2.isNullAt(3) && r2.getDouble(3) == 0.0,
      r2.toString)
  }
}
