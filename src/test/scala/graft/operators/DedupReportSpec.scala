package graft.operators

import graft.SparkSpec

/** Dedup report card (d28): per-source attribution of corpus-global
  * duplication, including clusters that span sources.
  */
class DedupReportSpec extends SparkSpec {
  import spark.implicits._

  test("cross-source clusters count in every source they touch") {
    // cluster {1,2,10}: 1,2 in srcA, 10 in srcB; cluster {20,21} in
    // srcB; 3 and 30 unique
    val docs = Seq(
      (1L, "srcA"), (2L, "srcA"), (3L, "srcA"),
      (10L, "srcB"), (20L, "srcB"), (21L, "srcB"), (30L, "srcB"))
      .toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (2L, 10L), (20L, 21L)).toDF("id1", "id2")
    val out = Dedup.dedupReport(docs, "doc_id", "source", pairs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))
      .toMap
    // srcA: 3 docs, 2 duplicated (cluster size 3), 1 cluster, max 3
    assert(out("srcA") == ((3L, 2L, 0.666667, 1L, 3L)), out("srcA"))
    // srcB: 4 docs, 3 duplicated (10 via the cross-source cluster,
    // 20+21), 2 clusters, max 3
    assert(out("srcB") == ((4L, 3L, 0.75, 2L, 3L)), out("srcB"))
  }

  test("a pair-free corpus reports zero duplication everywhere") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val out = Dedup.dedupReport(docs, "doc_id", "source",
        Seq.empty[(Long, Long)].toDF("id1", "id2"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("a") == ((2L, 0L, 0.0, 0L, 1L)), out("a"))
    assert(out("b") == ((1L, 0L, 0.0, 0L, 1L)), out("b"))
  }
}

/** Normalized exact dedup (d29): the C4-style normalize-then-hash
  * equivalence class and its boundaries.
  */
class NormalizedDedupSpec extends SparkSpec {
  import spark.implicits._

  test("casing/punctuation/whitespace variants collapse; real edits don't") {
    val df = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "HELLO ... world"),
      (4L, "hello worlds"),     // a real edit survives
      (5L, "?!...,"),           // normalizes to empty
      (6L, "  ,,  "))           // also empty: groups with 5, not text
      .toDF("doc_id", "text")
    val out = Dedup.normalizedExact(df, "doc_id", "text")
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 3L, 4L -> 1L, 5L -> 2L), out)
  }
}
