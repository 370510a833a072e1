package graft.operators

import graft.SparkSpec

/** Equi-width histogram (q65): hand-checked bin assignment at the
  * boundaries, empty-bin materialization, degenerate domain.
  */
class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("boundary values land in the integer-rule bin; max clamps to last") {
    // domain [0, 10], 5 bins of width 2: 2.0 is the FIRST value of
    // bin 1 ((200-0)*5 // 1000 = 1), 10.0 clamps into bin 4
    val df = Seq(0.0, 1.99, 2.0, 9.99, 10.0).toDF("x")
    val rows = Profile.histogram(df, "x", bins = 5).collect()
    assert(rows.map(_.getLong(3)).toSeq == Seq(2L, 1L, 0L, 0L, 2L))
    assert(rows.head.getDouble(1) == 0.0 && rows.last.getDouble(2) == 10.0)
  }

  test("empty bins are rows with count 0 and the shares sum to 1") {
    val df = Seq(1.0, 100.0).toDF("x")
    val rows = Profile.histogram(df, "x", bins = 10).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(3)).sum == 2L)
    assert(rows.count(_.getLong(3) == 0L) == 8)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-9)
  }

  test("degenerate single-value domain collapses to bin 0, no division") {
    val rows = Profile.histogram(Seq.fill(5)(7.5).toDF("x"), "x", 4).collect()
    assert(rows.map(_.getLong(3)).toSeq == Seq(5L, 0L, 0L, 0L))
  }

  test("span × bins past Long.MaxValue still bins exactly (DECIMAL rule)") {
    // scale=6, domain [0, 2e9]: span in scaled units = 2e15, × 10000
    // bins = 2e19 > Long.MaxValue — the long product would wrap to a
    // NEGATIVE bin (r15 ADVICE); the DECIMAL(38,0) product must not.
    val df = Seq(0.0, 1.0e9, 2.0e9).toDF("x")
    val rows = Profile.histogram(df, "x", bins = 10000, scale = 6).collect()
    assert(rows.length == 10000)
    val nonEmpty = rows.filter(_.getLong(3) > 0L).map(r =>
      (r.getLong(0), r.getLong(3))).toSeq
    assert(nonEmpty == Seq((0L, 1L), (5000L, 1L), (9999L, 1L)), nonEmpty)
  }
}
