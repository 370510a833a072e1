package graft.operators

import graft.SparkSpec

/** kNN majority-vote classification (s38): hand-built geometry and
  * the deterministic tie rules.
  */
class KnnClassifySpec extends SparkSpec {
  import spark.implicits._

  private val seeds = Seq(
    // two tight clusters on orthogonal axes, labels 1 and 2
    (0L, Array(1.0f, 0.0f), 1), (1L, Array(0.9f, 0.1f), 1),
    (2L, Array(0.8f, 0.2f), 1),
    (10L, Array(0.0f, 1.0f), 2), (11L, Array(0.1f, 0.9f), 2),
    (12L, Array(0.2f, 0.8f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("queries take the local cluster's majority label") {
    val qs = Seq((100L, Array(1.0f, 0.05f), 0), (101L, Array(0.05f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(qs, seeds, "vec_id", "embedding",
      "label", k = 3).orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((100L, 1L, 3L), (101L, 2L, 3L)))
  }

  test("vote ties break to the smaller label") {
    // k=2 on the diagonal: one neighbor from each cluster -> 1 vote
    // each -> label 1 wins
    val qs = Seq((100L, Array(1.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(qs, seeds, "vec_id", "embedding",
      "label", k = 2).collect()
    assert(out.head.getLong(1) == 1L && out.head.getLong(2) == 1L)
  }

  test("a seed never votes for itself when id spaces overlap") {
    // query id 0 equals a seed id: that seed is excluded, the
    // remaining cluster still carries the vote
    val qs = Seq((0L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(qs, seeds, "vec_id", "embedding",
      "label", k = 2).collect()
    assert(out.head.getLong(1) == 1L)
  }
}
