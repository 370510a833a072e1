package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cluster-aware leakage-safe splitting (p18): near-dup components
  * never straddle a split boundary, and without pairs the operator
  * degenerates to the plain p05 hash split.
  */
class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  test("every member of a near-dup cluster lands in the same split") {
    // ids chosen so their OWN md5 buckets differ (1 -> train, 2 -> val
    // under 0.2/0.2: md5("1")=c4..., md5("2")=c8...; use ids whose
    // individual splits provably disagree, then pair them)
    val ids = (1L to 200L).toDF("doc_id")
    val own = Training.assignSplit(ids, "doc_id", 0.2, 0.2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // find two ids with different individual splits to link
    val (a, b) = {
      val bysplit = own.groupBy(_._2).map { case (s, m) => s -> m.keys.min }
      val two = bysplit.values.toSeq.sorted.take(2)
      (two(0), two(1))
    }
    assert(own(a) != own(b), s"need differing individual splits: $a $b")
    val pairs = Seq((a, b)).toDF("id1", "id2")
    val out = Training.leakageSafeSplit(ids, "doc_id", pairs, 0.2, 0.2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // both inherit the component representative min(a,b)'s bucket
    assert(out(a) == out(b), s"${out(a)} vs ${out(b)}")
    assert(out(a)._1 == math.min(a, b))
    assert(out(a)._2 == own(math.min(a, b)))
  }

  test("with no pairs the split is exactly assignSplit") {
    val ids = (1L to 300L).toDF("doc_id")
    val plain = Training.assignSplit(ids, "doc_id", 0.1, 0.1)
      .select("doc_id", "split")
    val safe = Training.leakageSafeSplit(ids, "doc_id",
        Seq.empty[(Long, Long)].toDF("id1", "id2"), 0.1, 0.1)
      .select("doc_id", "split")
    assert(plain.exceptAll(safe).isEmpty && safe.exceptAll(plain).isEmpty)
  }

  test("a transitive chain shares one split end to end") {
    val ids = (1L to 10L).toDF("doc_id")
    val pairs = Seq((1L, 4L), (4L, 9L), (2L, 7L)).toDF("id1", "id2")
    val out = Training.leakageSafeSplit(ids, "doc_id", pairs, 0.3, 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(Set(out(1L), out(4L), out(9L)).size == 1)
    assert(out(1L)._1 == 1L)
    assert(out(2L) == out(7L) && out(2L)._1 == 2L)
    // unlinked doc keeps its own component
    assert(out(3L)._1 == 3L)
  }
}
