package graft.operators

import graft.SparkSpec

/** Lorenz/Gini (q55): hand-computed coefficient, the equality and
  * concentration extremes.
  */
class LorenzSpec extends SparkSpec {
  import spark.implicits._

  private def gini(xs: Seq[Double]): Double = {
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("id", "x")
    Stats.lorenzGini(df, "id", "x").collect().head.getDouble(3)
  }

  test("hand-computed: values 1,2,3,4 give gini exactly 0.25") {
    // ranks 1..4, sum(r*x) = 1+4+9+16 = 30, n = 4, T = 10:
    // 2*30/(4*10) - 5/4 = 1.5 - 1.25 = 0.25
    assert(gini(Seq(1.0, 2.0, 3.0, 4.0)) == 0.25)
  }

  test("perfect equality scores 0; total concentration approaches (n-1)/n") {
    assert(gini(Seq.fill(10)(7.0)) == 0.0)
    // one member owns everything: gini = (n-1)/n = 0.9 exactly
    assert(gini(Seq.fill(9)(0.0) :+ 100.0) == 0.9)
  }

  test("deciles partition by rank and the curve ends at share 1") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "x")
    val rows = Stats.lorenzGini(df, "id", "x").collect()
    assert(rows.length == 10 && rows.forall(_.getLong(1) == 10L))
    assert(rows.last.getDouble(2) == 1.0, rows.last.toString)
    // Lorenz curve is convex: increments strictly grow for distinct
    // ascending values
    val shares = rows.map(_.getDouble(2))
    val inc = shares.zip(0.0 +: shares.init).map { case (a, b) => a - b }
    assert(inc.zip(inc.tail).forall { case (a, b) => b > a }, inc.toSeq.toString)
  }
}
