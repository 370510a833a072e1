package graft.operators

import graft.SparkSpec

/** Exact all-pairs sparse weighted cosine (d33). */
class SparseCosineSpec extends SparkSpec {
  import spark.implicits._

  test("df-damped tf cosine matches the hand computation (and differs from set jaccard)") {
    // d1 "x x y" -> tf {x:2, y:1}; d2 "x y y" -> tf {x:1, y:2};
    // d3 "z z z" shares nothing. df: x=2, y=2, z=1.
    // w1 = {x:1.0, y:0.5}, w2 = {x:0.5, y:1.0}
    // dot = 1.0  |w1| = |w2| = sqrt(1.25)  cosine = 1/1.25 = 0.8
    // (set jaccard of d1,d2 is 1.0 — the weighting is what differs)
    val docs = Seq((1L, "x x y"), (2L, "x y y"), (3L, "z z z"))
      .toDF("doc_id", "text")
    val got = Dedup.allPairsCosine(docs, "doc_id", "text",
        tau = 0.5, shingleN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.8)))
  }

  test("identical multisets give cosine 1.0; tau filters below") {
    val docs = Seq((1L, "a a b"), (2L, "a a b"), (3L, "a c c"))
      .toDF("doc_id", "text")
    val got = Dedup.allPairsCosine(docs, "doc_id", "text",
        tau = 0.99, shingleN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("3-gram mode emits nothing for sub-3-token docs") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(Dedup.allPairsCosine(docs, "doc_id", "text",
      tau = 0.1, shingleN = 3).isEmpty)
  }
}
