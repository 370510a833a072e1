package graft.operators

import graft.SparkSpec

/** Chi-square independence (q53): hand-checked 2x2, planted
  * dependence, and the absent-cell expected mass.
  */
class Chi2Spec extends SparkSpec {
  import spark.implicits._

  test("hand-computed 2x2: obs [[10,20],[20,10]] gives chi2 = 6.6667") {
    // rows r1/r2, cols c1/c2; totals 30/30/30/30, N=60 -> E=15 every
    // cell, residual (obs-15)/sqrt(15), chi2 = 4*(25/15) = 6.666667
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(20)(("r2", "c1")) ++ Seq.fill(10)(("r2", "c2"))
    val out = Stats.chi2Independence(rows.toDF("r", "c"), "r", "c").collect()
    assert(out.forall(_.getDouble(3) == 15.0), out.mkString(","))
    assert(out.last.getDouble(5) == 6.666667, out.last.toString)
    assert(out.forall(_.getLong(6) == 1L), "df = (2-1)(2-1)")
  }

  test("independent margins give chi2 0; absent cells keep expected mass") {
    // perfectly proportional table -> every residual exactly 0
    val prop = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(20)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val out = Stats.chi2Independence(prop.toDF("r", "c"), "r", "c").collect()
    assert(out.last.getDouble(5) == 0.0, out.mkString(","))
    // an observed-zero cell: (r2,c2) never occurs but E > 0 and the
    // cell still contributes to the statistic
    val hole = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(10)(("r1", "c2")) ++
      Seq.fill(10)(("r2", "c1"))
    val out2 = Stats.chi2Independence(hole.toDF("r", "c"), "r", "c").collect()
    val cell = out2.find(r => r.getString(0) == "r2" && r.getString(1) == "c2").get
    assert(cell.getLong(2) == 0L && cell.getDouble(3) > 0.0, cell.toString)
    assert(out2.last.getDouble(5) > 0.0)
  }
}
