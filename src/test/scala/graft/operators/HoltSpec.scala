package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Holt linear-trend forecast (r39): the dyadic filter coefficients
  * must equal the sequential recurrence exactly, trend must be caught
  * where a level-only EWMA lags, and the zero-fill/span rules hold.
  */
class HoltSpec extends SparkSpec {
  import spark.implicits._

  test("coefficients: level sums to 2^shift, trend to 0; W=2 hand case") {
    val (lc, bc, s) = Windows.holtCoeffs(16)
    assert(s == 30)
    assert(lc.sum == (BigInt(1) << 30) && bc.sum == 0)
    // W=2: l1=(y0+y1)/2, b1=(y1-y0)/4 -> l=[2,2]/4, b=[-1,1]/4
    val (l2, b2, s2) = Windows.holtCoeffs(2)
    assert(s2 == 2 && l2.toSeq == Seq(BigInt(2), BigInt(2))
      && b2.toSeq == Seq(BigInt(-1), BigInt(1)))
  }

  /** Sequential reference: dyadic halving is exact in IEEE for these
    * magnitudes, so the recurrence replays bit-exactly in Double. */
  private def holtSeq(ys: Seq[Double]): (Double, Double) = {
    var l = ys.head; var b = 0.0
    for (y <- ys.tail) {
      val l1 = (y + l + b) / 2.0
      b = (l1 - l + b) / 2.0
      l = l1
    }
    (l + b, b)
  }

  private def run(counts: Map[Int, Int]): Array[org.apache.spark.sql.Row] = {
    // hour i carries counts(i) events (absent key = no rows that hour)
    val rows = counts.toSeq.flatMap { case (h, c) =>
      Seq.fill(c)(1755000000L / 3600 * 3600 + h * 3600L)
    }
    val df = rows.toDF("sec")
      .select(timestamp_seconds(col("sec")).as("ts"), lit("k").as("key"))
    Windows.holtForecast(df, "ts", "key").orderBy("hr_start").collect()
  }

  test("forecast equals the sequential recurrence on a ramp, slope caught") {
    // linear ramp 1..17 on consecutive hours: hour 16 scores from
    // y=1..16; Holt's slope must be positive and the forecast above
    // the trailing mean (what r20's level-only EWMA reports)
    val counts = (0 to 16).map(h => h -> (h + 1)).toMap
    val out = run(counts)
    assert(out.length == 1)
    val (f, sl) = holtSeq((1 to 16).map(_.toDouble))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getDouble(3) == r6(f), s"got ${out.head.getDouble(3)} want $f")
    assert(out.head.getDouble(4) == r6(sl) && sl > 0.9)
    assert(f > (1 to 16).sum / 16.0, "trend term must lift the forecast")
  }

  test("absent hours zero-fill; scoring starts at first-hr + window") {
    // key present hours 0..4 and 20: hour 20 scores (span 20 >= 16)
    // from y = counts at hours 4..19 = (5,0,0,...,0)
    val counts = (0 to 4).map(h => h -> (h + 1)).toMap + (20 -> 7)
    val out = run(counts)
    assert(out.length == 1 && out.head.getLong(1) == (1755000000L / 3600 * 3600 + 20 * 3600L))
    val (f, _) = holtSeq(5.0 +: Seq.fill(15)(0.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getDouble(3) == r6(f), s"got ${out.head.getDouble(3)} want $f")
    // hours 0..4 must NOT score: history span < window
    assert(!out.exists(_.getLong(1) < (1755000000L / 3600 * 3600 + 20 * 3600L)))
  }

  test("constant series forecasts itself with zero slope, no flags") {
    val counts = (0 to 18).map(h => h -> 5).toMap
    val out = run(counts)
    assert(out.nonEmpty)
    assert(out.forall(r => r.getDouble(3) == 5.0 && r.getDouble(4) == 0.0
      && !r.getBoolean(5) && !r.getBoolean(6)))
  }
}
