package graft.operators

import graft.SparkSpec

/** Mann–Whitney U (q52): hand-checked midrank ties, stochastic
  * dominance, and the zero-variance degenerate.
  */
class MannWhitneySpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed U with a midrank tie: a={1,3} b={2,3} gives 1.5") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 3.0)).toDF("k", "x")
    val row = Stats.mannWhitneyAllPairs(df, "k", "x").collect().head
    // a=1 beats nothing; a=3 beats b=2 and half-ties b=3 -> U = 1.5
    assert(row.getDouble(4) == 1.5, row.toString)
    assert(row.getDouble(5) == 0.375, "AUC = U/(n_a*n_b) = 1.5/4")
  }

  test("complete dominance: AUC is P(a>b), so a-below-b gives 0 / a-above gives 1") {
    val lo = (1 to 100).map(i => (i.toDouble))
    val hi = (201 to 300).map(i => (i.toDouble))
    val df = (lo.map(("a", _)) ++ hi.map(("b", _))).toDF("k", "x")
    val row = Stats.mannWhitneyAllPairs(df, "k", "x").collect().head
    assert(row.getDouble(5) == 0.0, "no a-value ever exceeds a b-value")
    assert(row.getDouble(6) < -10.0, s"z=${row.getDouble(6)}")
    // flipped arms: the same data with labels swapped mirrors exactly
    val df2 = (lo.map(("b", _)) ++ hi.map(("a", _))).toDF("k", "x")
    val r2 = Stats.mannWhitneyAllPairs(df2, "k", "x").collect().head
    assert(r2.getDouble(5) == 1.0 && r2.getDouble(6) > 10.0, r2.toString)
  }

  test("all-tied samples: AUC 0.5, z NULL (zero variance, not inf)") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("k", "x")
    val row = Stats.mannWhitneyAllPairs(df, "k", "x").collect().head
    assert(row.getDouble(5) == 0.5, row.toString)
    assert(row.isNullAt(6), "tie-degenerate variance must yield NULL z")
  }
}
