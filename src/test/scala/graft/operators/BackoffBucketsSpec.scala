package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-slice CCNet bucketing (t36): documents whose bigrams the
  * reference slice saw ride bigram mass into the head of their
  * language's distribution; out-of-domain text falls to the backed-off
  * unigram floor and the tail.
  */
class BackoffBucketsSpec extends SparkSpec {
  import spark.implicits._

  test("in-domain docs bucket head, gibberish buckets tail, per language") {
    val ref = (1L to 30L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog", "en"))
    // language xx at three score levels (ties WITHIN each level, so
    // the by-value cut lands 0/6 < 1/3 -> head, 2/6 -> middle,
    // 4/6 -> tail): fully in-domain, half in-domain, pure gibberish
    val inDomain = (101L to 102L).map(i =>
      (i, "the quick brown fox jumps", "xx"))
    val halfIn = (103L to 104L).map(i =>
      (i, "the quick zzz yyy", "xx"))
    val gibberish = (105L to 106L).map(i =>
      (i, "zzq wvx qqj mmk", "xx"))
    val df = (ref ++ inDomain ++ halfIn ++ gibberish)
      .toDF("doc_id", "text", "lang")
    val out = TextStats.backoffPplBuckets(df, "doc_id", "text", "lang",
        lmPred = col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    for (i <- 101L to 102L) assert(out(i) == "head", s"$i -> ${out(i)}")
    for (i <- 103L to 104L) assert(out(i) == "middle", s"$i -> ${out(i)}")
    for (i <- 105L to 106L) assert(out(i) == "tail", s"$i -> ${out(i)}")
  }

  test("docs with fewer than two tokens drop (no bigram evidence)") {
    val df = Seq(
      (1L, "the quick brown fox", "en"),
      (2L, "single", "en"),
      (3L, "", "en")).toDF("doc_id", "text", "lang")
    val ids = TextStats.backoffPplBuckets(df, "doc_id", "text", "lang",
        lmPred = col("lang") === "en")
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }
}
