package graft.operators

import graft.SparkSpec

/** Centroid similarity matrix (s23): aligned slices read ~1,
  * orthogonal slices ~0, zero-centroid slices drop.
  */
class CentroidSimSpec extends SparkSpec {
  import spark.implicits._

  test("aligned ~1, orthogonal ~0, zero-norm dropped, upper triangle only") {
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.8f, 0.0f), 0), // label 0: +x
      (3L, Array(0.5f, 0.0f), 1),                             // label 1: +x too
      (4L, Array(0.0f, 1.0f), 2), (5L, Array(0.0f, 0.4f), 2), // label 2: +y
      (6L, Array(1.0f, 1.0f), 3), (7L, Array(-1.0f, -1.0f), 3)) // label 3: zero mean
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidSimilarity(rows, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out((0, 1)) == 1.0, out)
    assert(out((0, 2)) == 0.0 && out((1, 2)) == 0.0, out)
    // label 3's centroid is the zero vector: no pair involves it
    assert(!out.keySet.exists(k => k._1 == 3 || k._2 == 3), out.keySet)
    // strict upper triangle: no self pairs, no mirrored pairs
    assert(out.keySet.forall { case (a, b) => a < b }, out.keySet)
    assert(out.size == 3, out)
  }
}
