package graft.operators

import graft.SparkSpec

/** KN-score CCNet terciles (t42): per-language by-value cut via the
  * shared tercile helper, equal scores share a bucket, languages cut
  * independently.
  */
class KnBucketsSpec extends SparkSpec {
  import spark.implicits._

  test("each language cuts into thirds by value; twins share a bucket") {
    // 6 en docs with 3 distinct fluency levels (2 docs each: repeated
    // phrasing scores high, word salad low) + 3 fr docs — the fr cut
    // must not mix into en's distribution
    val fluent = "the cat sat on the mat and the cat sat again"
    val mid = "a dog ran over a hill while a bird flew past"
    val salad = "mat the on sat quick cat zebra lamp ocean twelve"
    val docs = Seq(
      ("e1", fluent, "en"), ("e2", fluent, "en"),
      ("e3", mid, "en"), ("e4", mid, "en"),
      ("e5", salad, "en"), ("e6", salad, "en"),
      ("f1", "bon bon bon bon bon", "fr"),
      ("f2", "le chat dort le chat mange", "fr"),
      ("f3", "zut alors bizarre quand soudain", "fr"))
    val out = TextStats.knBuckets(docs.toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getDouble(2), r.getString(3)))
      .toMap
    // identical docs -> identical scores -> identical buckets
    assert(out("e1")._3 == out("e2")._3)
    assert(out("e3")._3 == out("e4")._3)
    assert(out("e5")._3 == out("e6")._3)
    // three distinct en score levels -> all three buckets appear, in
    // score order (higher logprob = head)
    val byScore = Seq("e1", "e3", "e5").map(out(_)).sortBy(-_._2).map(_._3)
    assert(byScore == Seq("head", "middle", "tail"), byScore)
    // fr cuts its own distribution: 3 distinct scores -> 3 buckets
    val fr = Seq("f1", "f2", "f3").map(out(_)._3).toSet
    assert(fr == Set("head", "middle", "tail"), fr)
  }
}
