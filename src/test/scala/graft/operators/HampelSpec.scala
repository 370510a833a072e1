package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Hampel moving median/MAD (r38): the diurnal case that breaks a
  * global baseline, plus the local spike and the degenerate rule.
  */
class HampelSpec extends SparkSpec {
  import spark.implicits._

  private def events(rates: Seq[(Long, Int)], key: String = "k") =
    rates.flatMap { case (h, r) =>
      Seq.fill(r)((key, new Timestamp(h * 3600L * 1000L)))
    }.toDF("k", "ts")

  test("a clean diurnal pattern never flags locally (global MAD would)") {
    // 4 days of day=100/night=10 square wave: r35's global median
    // calls half the series outliers; Hampel compares each hour to
    // its +-3h neighborhood, where the pattern is normal... except at
    // the square-wave EDGES, where the neighborhood mixes regimes.
    // Use a smooth ramp instead - strictly no local outliers:
    val ramp = (0L until 48L).map(h => (h, 10 + (h % 24).toInt * 5))
    val out = Windows.hampel(events(ramp), "ts", "k").collect()
    val flagged = out.count(_.getBoolean(5))
    // only the two wrap-around cliffs (23->0) may flag; the ramp body
    // must be clean
    assert(flagged <= 4, s"$flagged hours flagged on a smooth ramp")
    assert(out.length == 48)
  }

  test("a single local spike flags; its neighbors do not") {
    val flat = (0L until 24L).map(h => (h, 10)).updated(12, (12L, 200))
    val out = Windows.hampel(events(flat), "ts", "k").collect()
      .map(r => (r.getLong(1) / 3600L, r.getBoolean(5))).toMap
    assert(out(12L), "the spike hour must flag")
    // MAD=0 neighborhoods: exact-median hours never flag (0 > 0 false)
    assert((0L until 24L).filter(_ != 12L).forall(h => !out(h)),
      out.toString)
  }

  test("window median/MAD are the hand values at a regime edge") {
    // hours 0..6 counts 1,1,1,9,9,9,9: center h=3 window = all seven
    // -> med 9? sorted 1,1,1,9,9,9,9 median = 9; deviations
    // |c-9| = 8,8,8,0,0,0,0 -> MAD 0; |9-9|=0 not > 0 -> no flag
    val df = events(Seq((0L, 1), (1L, 1), (2L, 1), (3L, 9), (4L, 9),
      (5L, 9), (6L, 9)))
    val r3 = Windows.hampel(df, "ts", "k").collect()
      .find(_.getLong(1) == 3L * 3600L).get
    assert(r3.getDouble(3) == 9.0 && r3.getDouble(4) == 0.0, r3.toString)
    assert(!r3.getBoolean(5))
  }
}
