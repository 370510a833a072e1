package graft.operators

import graft.SparkSpec

/** Vocabulary coverage curve (t49): hand-checked mass shares, the
  * cut-exceeds-vocab case, and tie-break determinism.
  */
class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: top-1 and top-2 mass shares; cut past the vocab") {
    // counts: the=4, a=2, b=1, c=1 (total 8)
    val docs = Seq("the the a b", "the the a c").toDF("text")
    val out = TextStats.vocabCoverage(docs, "text", Seq(1L, 2L, 100L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 4L, 8L, 0.5),
      (2L, 2L, 6L, 8L, 0.75),
      (100L, 4L, 8L, 8L, 1.0)), out.toSeq.toString)
  }

  test("equal counts break ties by term, deterministically") {
    val docs = Seq("b a").toDF("text")
    val out = TextStats.vocabCoverage(docs, "text", Seq(1L)).collect()
    // a and b tie at count 1; rank 1 is 'a' — one term, half the mass
    assert(out.head.getLong(1) == 1L && out.head.getDouble(4) == 0.5)
  }
}
