package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Prototypicality pruning (s28): rank order against a hand-built
  * geometry, the exact-integer prune cut, the zero-norm drop, and
  * param validation.
  */
class ProtoPruneSpec extends SparkSpec {
  import spark.implicits._

  test("rank follows centroid cosine; the cut prunes exactly n*num div den") {
    // label A: 5 spread vectors; the centroid is the mean (0.64, 0.36)
    // so prototypicality order is angular closeness to THAT direction:
    // 3 (0.7,0.3) first, then 4, 2, 1, and the outlier 5 last
    val rows = Seq(
      (1L, "A", Array(1.0f, 0.0f)),
      (2L, "A", Array(0.9f, 0.1f)),
      (3L, "A", Array(0.7f, 0.3f)),   // nearest the mean direction
      (4L, "A", Array(0.5f, 0.5f)),
      (5L, "A", Array(0.1f, 0.9f)),   // least prototypical
      (6L, "B", Array(-1.0f, 0.0f)),
      (7L, "B", Array(-0.8f, -0.2f)))
    val out = Similarity.protoPrune(rows.toDF("vec_id", "label", "embedding"),
        "vec_id", "label", "embedding", pruneNum = 2, pruneDen = 5)
      .orderBy("label", "rank_in_label").collect()
    val a = out.filter(_.getString(1) == "A")
    assert(a.map(_.getLong(0)).toSeq == Seq(3L, 4L, 2L, 1L, 5L), a.mkString)
    // 5 * 2 div 5 = 2 pruned: ranks 1,2 dropped, 3..5 kept
    assert(a.map(r => (r.getLong(3), r.getBoolean(5))).toSeq ==
      Seq((1L, false), (2L, false), (3L, true), (4L, true), (5L, true)), a.mkString)
    // B: 2 * 2 div 5 = 0 pruned — small clusters keep everything
    val b = out.filter(_.getString(1) == "B")
    assert(b.forall(_.getBoolean(5)) && b.map(_.getLong(4)).forall(_ == 2L), b.mkString)
    // scores are monotone within the label
    assert(a.map(_.getDouble(2)).toSeq == a.map(_.getDouble(2)).sortBy(-_).toSeq)
  }

  test("zero-norm vectors drop by the no-evidence rule") {
    val rows = Seq(
      (1L, "A", Array(1.0f, 0.0f)),
      (2L, "A", Array(0.0f, 0.0f)),
      (3L, "A", Array(0.8f, 0.2f)))
    val out = Similarity.protoPrune(rows.toDF("vec_id", "label", "embedding"),
        "vec_id", "label", "embedding", 1, 2).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 3L), out.mkString)
    assert(out.forall(_.getLong(4) == 2L), out.mkString) // n_label counts survivors
  }

  test("centroid drift: identical snapshots read 1.0, a moved label reads below") {
    val old_ = Seq(
      (1L, "A", Array(1.0f, 0.0f)), (2L, "A", Array(0.9f, 0.1f)),
      (3L, "B", Array(0.0f, 1.0f)),
      (4L, "C", Array(0.5f, 0.5f))) // C missing from the new snapshot
    val new_ = Seq(
      (5L, "A", Array(1.0f, 0.0f)), (6L, "A", Array(0.9f, 0.1f)), // unchanged
      (7L, "B", Array(1.0f, 0.2f))) // B rotated hard
    val out = Similarity.centroidDrift(
        old_.toDF("vec_id", "label", "embedding"),
        new_.toDF("vec_id", "label", "embedding"),
        "label", "embedding")
      .orderBy("label").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"), out.mkString)
    val a = out.head
    assert(a.getDouble(3) == 1.0 && a.getDouble(4) == 1.0, a)
    assert(a.getLong(1) == 2L && a.getLong(2) == 2L, a)
    val b = out(1)
    assert(b.getDouble(3) < 0.3, b) // near-orthogonal rotation
  }

  test("prune fraction 0 keeps everything; bad fractions fail loudly") {
    val df = Seq((1L, "A", Array(1.0f)), (2L, "A", Array(0.5f)))
      .toDF("vec_id", "label", "embedding")
    val all = Similarity.protoPrune(df, "vec_id", "label", "embedding", 0, 1)
      .collect()
    assert(all.length == 2 && all.forall(_.getBoolean(5)), all.mkString)
    intercept[IllegalArgumentException] {
      Similarity.protoPrune(df, "vec_id", "label", "embedding", 3, 2)
    }
    intercept[IllegalArgumentException] {
      Similarity.protoPrune(df, "vec_id", "label", "embedding", 1, 0)
    }
  }
}
