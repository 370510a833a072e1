package graft.operators

import graft.SparkSpec

/** Exact two-sample KS (q51): hand-checked D, a planted shift that
  * must reject, and the loud key bound.
  */
class KsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed D: a={1,2} vs b={2,3} gives exactly 0.5") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0))
      .toDF("k", "x")
    val row = Stats.ksAllPairs(df, "k", "x").collect().head
    // F_a steps 0.5/1.0/1.0 at values 1/2/3, F_b 0/0.5/1.0 — the gap
    // is 0.5 at both v=1 and v=2
    assert(row.getDouble(4) == 0.5, row.toString)
    assert(!row.getBoolean(5), "n=2 vs 2 cannot reject at 95%")
  }

  test("a planted location shift rejects; identical distributions do not") {
    val a = (0 until 500).map(i => ("a", (i % 100).toDouble))
    val b = (0 until 500).map(i => ("b", (i % 100).toDouble + 50.0))
    val c = (0 until 500).map(i => ("c", (i % 100).toDouble))
    val out = Stats.ksAllPairs((a ++ b ++ c).toDF("k", "x"), "k", "x")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(4), r.getBoolean(5)))
    val ab = out.find(p => p._1 == "a" && p._2 == "b").get
    val ac = out.find(p => p._1 == "a" && p._2 == "c").get
    // the +50 shift leaves half of b's mass beyond all of a's: D = 0.5
    assert(ab._3 == 0.5 && ab._4, ab.toString)
    // identical samples: D = 0, no rejection
    assert(ac._3 == 0.0 && !ac._4, ac.toString)
  }

  test("the key population is loudly bounded") {
    val df = (0 until 40).map(i => (s"k$i", i.toDouble)).toDF("k", "x")
    intercept[IllegalArgumentException] {
      Stats.ksAllPairs(df, "k", "x", maxKeys = 16)
    }
  }
}
