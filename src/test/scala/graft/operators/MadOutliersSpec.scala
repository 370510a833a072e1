package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** MAD/Hampel robust outliers (r35): the masking failure mean-based
  * charts have is exactly what the median baseline must not.
  */
class MadOutliersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hr: Long) = new Timestamp(hr * 3600L * 1000L)

  // one row per event: rate r at hour h means r rows
  private def events(rates: Seq[(Long, Int)], key: String = "k") =
    rates.flatMap { case (h, r) => Seq.fill(r)((key, ts(h))) }
      .toDF("k", "ts")

  test("one massive spike cannot mask itself (the mean-z failure case)") {
    // 23 quiet hours at 10/hr + one hour at 1000/hr. Trailing
    // mean/stddev charts let the spike inflate its own baseline; the
    // median stays 10 and MAD stays 0..tiny, so the spike flags.
    val df = events((0L until 23L).map(h => (h, 10)) :+ (23L, 1000))
    val out = Windows.madOutliers(df, "ts", "k").collect()
      .map(r => (r.getLong(1) / 3600L, r.getBoolean(5))).toMap
    assert(out(23L), "the 100x spike must flag")
    assert((0L until 23L).forall(h => !out(h)), "quiet hours must not flag")
  }

  test("hand-computed median/MAD: interpolated halves are exact") {
    // counts 2,4,6,8 -> median 5.0; deviations 3,1,1,3 -> MAD 2.0;
    // threshold 5*2=10: nothing flags
    val df = events(Seq((0L, 2), (1L, 4), (2L, 6), (3L, 8)))
    val rows = Windows.madOutliers(df, "ts", "k").collect()
    assert(rows.forall(_.getDouble(3) == 5.0), rows.mkString(","))
    assert(rows.forall(_.getDouble(4) == 2.0), rows.mkString(","))
    assert(rows.forall(!_.getBoolean(5)))
  }

  test("MAD = 0 degenerates to the r16 zero-variance rule: any deviation flags") {
    // majority-constant series: median 10, MAD 0 -> the one 11 flags,
    // the exact-10 hours do not (0 > 0 is false)
    val df = events(Seq((0L, 10), (1L, 10), (2L, 10), (3L, 10), (4L, 11)))
    val out = Windows.madOutliers(df, "ts", "k").collect()
      .map(r => (r.getLong(2), r.getBoolean(5)))
    assert(out.filter(_._1 == 11L).forall(_._2))
    assert(out.filter(_._1 == 10L).forall(!_._2))
  }

  test("keys baseline independently") {
    val df = events(Seq((0L, 10), (1L, 10), (2L, 10)), "a")
      .union(events(Seq((0L, 1000), (1L, 1000), (2L, 1000)), "b"))
    val rows = Windows.madOutliers(df, "ts", "k").collect()
    // b's huge-but-constant rate is ITS OWN baseline: nothing flags
    assert(rows.forall(!_.getBoolean(5)), rows.mkString(","))
  }
}
