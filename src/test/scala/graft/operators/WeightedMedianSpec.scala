package graft.operators

import graft.SparkSpec

/** Weighted median (q57): where it diverges from the unweighted one,
  * the exact crossing rule, and per-key independence.
  */
class WeightedMedianSpec extends SparkSpec {
  import spark.implicits._

  test("weight mass moves the median where row counts would not") {
    // values 1,2,3 with weights 1,1,10: unweighted median 2; weighted
    // total 12, half 6 — cum crosses at x=3
    val df = Seq(("k", 1.0, 1.0), ("k", 2.0, 1.0), ("k", 3.0, 10.0))
      .toDF("k", "x", "w")
    val row = Stats.weightedMedian(df, "k", "x", "w").collect().head
    assert(row.getDouble(1) == 3.0 && row.getDouble(2) == 12.0, row.toString)
  }

  test("exact boundary: 2*cum == total picks that value (lower median)") {
    // weights 1,1 over values 5,9: at x=5 cum=1, 2*1 >= 2 -> median 5
    val df = Seq(("k", 5.0, 1.0), ("k", 9.0, 1.0)).toDF("k", "x", "w")
    assert(Stats.weightedMedian(df, "k", "x", "w")
      .collect().head.getDouble(1) == 5.0)
  }

  test("keys compute independently") {
    val df = Seq(("a", 1.0, 1.0), ("a", 100.0, 3.0),
      ("b", 7.0, 5.0), ("b", 900.0, 1.0)).toDF("k", "x", "w")
    val got = Stats.weightedMedian(df, "k", "x", "w").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("a" -> 100.0, "b" -> 7.0), got.toString)
  }
}
