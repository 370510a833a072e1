package graft.operators

import graft.SparkSpec

/** FIFO lot allocation (q66): the hand-walked sequential answer, lot
  * spill across demand rows, and demand overrun.
  */
class FifoSpec extends SparkSpec {
  import spark.implicits._

  private def run(sup: Seq[(String, Int, Double, Double)],
                  dem: Seq[(String, Int, Double)]) = {
    val s = sup.toDF("k", "t", "q", "c")
    val d = dem.map { case (k, t, q) => (k, t, q, 0.0) }.toDF("k", "t", "q", "c")
    Windows.fifoAllocate(s, d, "k", "q", "c", Seq("t")).collect()
  }

  test("hand-walked: two lots, two demands, spill across the lot boundary") {
    // lots: 10 @ $2/u, 5 @ $3/u; demands: 8 then 4
    // FIFO: 8 from lot1 ($16), 2 from lot1 ($4) + 2 from lot2 ($6)
    val out = run(
      Seq(("p", 1, 10.0, 20.0), ("p", 2, 5.0, 15.0)),
      Seq(("p", 1, 8.0), ("p", 2, 4.0)))
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 3L && r.getDouble(2) == 12.0
      && r.getDouble(3) == 0.0 && r.getDouble(4) == 26.0, r.toString)
  }

  test("demand overrun reports unmatched; overrun rows beyond supply drop") {
    // supply 5 @ $10 total, demand 9: 5 match, 4 unmatched
    val out = run(Seq(("p", 1, 5.0, 10.0)), Seq(("p", 1, 9.0)))
    val r = out.head
    assert(r.getLong(1) == 1L && r.getDouble(2) == 5.0
      && r.getDouble(3) == 4.0 && r.getDouble(4) == 10.0, r.toString)
  }

  test("keys fold independently; single-sided keys are absent") {
    val out = run(
      Seq(("a", 1, 2.0, 4.0), ("orphan_supply", 1, 3.0, 6.0)),
      Seq(("a", 1, 2.0), ("orphan_demand", 1, 3.0)))
    assert(out.map(_.getString(0)).toSeq == Seq("a"))
    assert(out.head.getDouble(4) == 4.0)
  }

  test("fractional quantities keep exact cents: 1/3 of a $1.00 lot") {
    // ov=1, q=3, c=$1.00: term = round(10000*100*2... ) = 333333 micro
    val out = run(Seq(("p", 1, 3.0, 1.0)), Seq(("p", 1, 1.0)))
    assert(out.head.getDouble(4) == 0.333333, out.head.toString)
  }

  test("non-positive quantities drop by contract (no div-by-zero, no " +
    "spurious matches, totals exclude them)") {
    // zero-qty lot sits strictly inside the demand interval — the
    // degenerate [x,x) would otherwise pass the overlap filter and
    // divide by zero in the cost term; negative demand would break
    // prefix monotonicity. Result must equal the clean-input run.
    val out = run(
      Seq(("p", 1, 5.0, 10.0), ("p", 2, 0.0, 99.0), ("p", 3, 5.0, 20.0)),
      Seq(("p", 1, 8.0), ("p", 2, -3.0)))
    val r = out.head
    // FIFO: 5 from lot1 ($10) + 3 from lot3 ($12); unmatched 0
    assert(r.getLong(1) == 2L && r.getDouble(2) == 8.0
      && r.getDouble(3) == 0.0 && r.getDouble(4) == 22.0, r.toString)
    // all-dropped side → key absent, not a zero row
    val gone = run(Seq(("z", 1, 0.0, 5.0)), Seq(("z", 1, 1.0)))
    assert(gone.isEmpty)
  }
}
