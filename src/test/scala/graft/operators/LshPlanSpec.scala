package graft.operators

import graft.SparkSpec

/** LSH parameter planner (d38): the S-curve arithmetic on a
  * hand-computed pair, and the planner's defining monotonicities —
  * more rows per band trades recall for candidate mass.
  */
class LshPlanSpec extends SparkSpec {
  import spark.implicits._

  // two docs sharing half their shingles (s = 1/3), two identical
  // docs (s = 1): "a b c d" vs "a b c e" 3-gram-shingled share 1 of 2
  private lazy val plan = {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"),
      (3L, "x y z w"), (4L, "x y z w")).toDF("doc_id", "text")
    Dedup.lshPlan(Dedup.shingles(docs, "doc_id", "text", 3),
        tauNum = 1, tauDen = 2, splits = Seq((8, 1), (4, 2), (2, 4), (1, 8)))
      .collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
  }

  test("hand case: s=1/3 and s=1 pairs through the (8,1) and (1,8) curves") {
    // r=1, b=8: p(1/3) = 1 - (2/3)^8 = 0.960982..., p(1) = 1
    val (n1, t1, cand1, rec1, fp1) = plan(1L)
    assert(n1 == 2L && t1 == 1L) // only the identical pair passes tau=1/2
    assert(rec1 == 1.0)          // the true pair is always caught at r=1,b=8
    assert(fp1 == 0.960982, s"fp=$fp1")
    assert(cand1 == 1.960982, s"cand=$cand1")
    // r=8, b=1: p(1/3) = (1/3)^8 ~ 0.000152, p(1) = 1
    val (_, _, cand8, rec8, fp8) = plan(8L)
    assert(rec8 == 1.0 && fp8 == 0.000152 && cand8 == 1.000152,
      s"$cand8 $rec8 $fp8")
  }

  test("monotonicity: rows per band up -> expected candidates and FP down") {
    val byR = Seq(1L, 2L, 4L, 8L).map(r => plan(r))
    assert(byR.map(_._3).sliding(2).forall { case Seq(a, b) => a >= b })
    assert(byR.map(_._5).sliding(2).forall { case Seq(a, b) => a >= b })
  }
}
