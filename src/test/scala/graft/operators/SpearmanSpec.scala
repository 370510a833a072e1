package graft.operators

import graft.SparkSpec

/** Spearman (q64): hand-computed coefficients, the monotone
  * extremes, and the tie-corrected average-rank case.
  */
class SpearmanSpec extends SparkSpec {
  import spark.implicits._

  private def rho(pts: Seq[(Double, Double)]): Double = {
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("k", "x", "y")
    Stats.spearman(df, "k", "x", "y").collect().head.getDouble(2)
  }

  test("perfect monotone gives exactly +1 / -1 even when nonlinear") {
    // y = x^3 is monotone but nonlinear: Pearson < 1, Spearman == 1
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    assert(rho(xs.map(x => (x, x * x * x))) == 1.0)
    assert(rho(xs.map(x => (x, -x * x * x))) == -1.0)
  }

  test("hand-computed tie case matches the average-rank formula") {
    // x: 1,1,2,3 -> avg ranks 1.5,1.5,3,4 (doubled: 3,3,6,8)
    // y: 10,20,20,30 -> avg ranks 1,2.5,2.5,4 (doubled: 2,5,5,8)
    // Pearson over (3,3,6,8)/(2,5,5,8):
    //   n=4, sa=20, sb=20, saa=118, sbb=118, sab=6+15+30+64=115
    //   rho = (4*115-400)/(sqrt(4*118-400)*sqrt(4*118-400)) = 60/72
    val r = rho(Seq((1.0, 10.0), (1.0, 20.0), (2.0, 20.0), (3.0, 30.0)))
    assert(r == BigDecimal(60.0 / 72.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r.toString)
  }

  test("independent checkerboard scores 0; keys fold independently") {
    val pts = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0))
    assert(rho(pts) == 0.0)
    val df = (pts.map { case (x, y) => ("a", x, y) } ++
      Seq(1.0, 2.0, 3.0).map(x => ("b", x, x))).toDF("k", "x", "y")
    val rows = Stats.spearman(df, "k", "x", "y").collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(2))).toSeq ==
      Seq(("a", 0.0), ("b", 1.0)))
  }
}
