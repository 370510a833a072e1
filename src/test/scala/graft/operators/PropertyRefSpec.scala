package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Property-style reference checks for the two operators whose
  * declarative restatements are furthest from their textbook
  * sequential forms: Spearman (distributed doubled-rank maps vs a
  * direct rank-and-correlate) and FIFO allocation (interval-overlap
  * join vs the literal walk-both-lists loop). Seeded generators, so
  * failures replay.
  */
class PropertyRefSpec extends SparkSpec {
  import spark.implicits._

  // ---- Spearman reference: average ranks + Pearson, straight off
  // the definition (sortBy + groupBy, no distributed machinery)
  private def refSpearman(pts: Seq[(Double, Double)]): Double = {
    def avgRanks(xs: Seq[Double]): Map[Double, Double] =
      xs.sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.size) }
    val rx = avgRanks(pts.map(_._1)); val ry = avgRanks(pts.map(_._2))
    val a = pts.map(p => rx(p._1)); val b = pts.map(p => ry(p._2))
    val n = pts.size.toDouble
    val (sa, sb) = (a.sum, b.sum)
    val saa = a.map(x => x * x).sum; val sbb = b.map(x => x * x).sum
    val sab = a.zip(b).map { case (x, y) => x * y }.sum
    (n * sab - sa * sb) /
      (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
  }

  test("spearman matches the direct reference on 30 seeded tie-heavy datasets") {
    val rnd = new Random(42)
    for (trial <- 1 to 30) {
      // small value domains force heavy ties; sizes 5..40
      val n = 5 + rnd.nextInt(36)
      val dom = 2 + rnd.nextInt(6)
      val pts = Seq.fill(n)(
        (rnd.nextInt(dom).toDouble, rnd.nextInt(dom).toDouble))
      val expected = refSpearman(pts)
      if (!expected.isNaN) {
        val got = Stats.spearman(
          pts.map { case (x, y) => ("g", x, y) }.toDF("k", "x", "y"),
          "k", "x", "y").collect().head.getDouble(2)
        assert(math.abs(got - expected) < 1e-6,
          s"trial $trial (n=$n dom=$dom): got $got want $expected")
      }
    }
  }

  // ---- FIFO reference: the literal sequential walk
  private def refFifo(sup: Seq[(Double, Double)], dem: Seq[Double])
      : (Long, Double, Double) = {
    // returns (n_matches, matched_qty, cogs in microdollars/1e6)
    var (si, di) = (0, 0)
    var sLeft = if (sup.nonEmpty) sup.head._1 else 0.0
    var dLeft = if (dem.nonEmpty) dem.head else 0.0
    var matches = 0L; var qty = 0.0; var cogsMicro = 0L
    while (si < sup.length && di < dem.length) {
      val take = math.min(sLeft, dLeft)
      if (take > 0) {
        matches += 1; qty += take
        val (q0, c0) = sup(si)
        val ci = math.round(c0 * 100); val qi = math.round(q0 * 100)
        val vi = math.round(take * 100)
        cogsMicro += (2L * ci * vi * 10000L + qi) / (2L * qi)
      }
      sLeft -= take; dLeft -= take
      if (sLeft <= 0) { si += 1; if (si < sup.length) sLeft = sup(si)._1 }
      if (dLeft <= 0) { di += 1; if (di < dem.length) dLeft = dem(di) }
    }
    (matches, qty, cogsMicro / 1e6)
  }

  test("fifoAllocate matches the sequential walk on 30 seeded lot lists") {
    val rnd = new Random(7)
    for (trial <- 1 to 30) {
      val ns = 1 + rnd.nextInt(6); val nd = 1 + rnd.nextInt(6)
      // integer-cent quantities/costs so the reference's micro
      // arithmetic replays the operator's exactly
      val sup = Seq.fill(ns)(((1 + rnd.nextInt(20)).toDouble,
        (1 + rnd.nextInt(500)) / 100.0 * (1 + rnd.nextInt(20))))
      val dem = Seq.fill(nd)((1 + rnd.nextInt(20)).toDouble)
      val (em, eq, ec) = refFifo(sup, dem)
      val sdf = sup.zipWithIndex.map { case ((q, c), i) => ("p", i, q, c) }
        .toDF("k", "t", "q", "c")
      val ddf = dem.zipWithIndex.map { case (q, i) => ("p", i, q, 0.0) }
        .toDF("k", "t", "q", "c")
      val out = Windows.fifoAllocate(sdf, ddf, "k", "q", "c", Seq("t"))
        .collect().head
      assert(out.getLong(1) == em && out.getDouble(2) == eq,
        s"trial $trial: got (${out.getLong(1)},${out.getDouble(2)}) want ($em,$eq)")
      assert(math.abs(out.getDouble(4) - ec) < 1e-9,
        s"trial $trial cogs: got ${out.getDouble(4)} want $ec")
    }
  }
}
