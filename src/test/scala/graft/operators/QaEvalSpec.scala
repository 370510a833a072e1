package graft.operators

import graft.SparkSpec

/** The pipeline-QA operators: ANN recall@k (s35) and dedup pair
  * recovery (d32) on hand-computed inputs.
  */
class QaEvalSpec extends SparkSpec {
  import spark.implicits._

  test("recallAtK counts hits per query against the exact side's k-denominator") {
    val exact = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L),            // only 2 exact rows for q2
      (3L, 30L, 1L), (3L, 31L, 2L), (3L, 32L, 3L)
    ).toDF("query_id", "neighbor_id", "rank")
    val approx = Seq(
      (1L, 10L, 1L), (1L, 12L, 2L), (1L, 99L, 3L), // 2/3 hits
      (2L, 20L, 1L), (2L, 21L, 2L),                // 2/2
      (3L, 99L, 1L), (3L, 98L, 2L), (3L, 97L, 3L), // 0/3
      (1L, 13L, 4L)                                // rank 4 ignored at k=3
    ).toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.recallAtK(approx, exact, k = 3)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 3L, 2L, 0.666667), (2L, 2L, 2L, 1.0),
      (3L, 3L, 0L, 0.0)))
  }

  test("recallAtK ignores approx rows past k and dedupes repeated candidates") {
    val exact = Seq((1L, 10L, 1L)).toDF("query_id", "neighbor_id", "rank")
    val approx = Seq((1L, 10L, 1L), (1L, 10L, 2L), (1L, 10L, 5L))
      .toDF("query_id", "neighbor_id", "rank")
    val r = Similarity.recallAtK(approx, exact, k = 2).collect().head
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == ((1L, 1L, 1.0)))
  }

  test("pairRecovery normalizes orientation and reports precision/recall") {
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id1", "id2")
    // found: one reversed duplicate of a true pair, one false positive
    val found = Seq((2L, 1L), (1L, 2L), (4L, 3L), (7L, 8L)).toDF("id1", "id2")
    val r = Dedup.pairRecovery(found, truth).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 2L)))
    assert(r.getDouble(3) == 0.666667) // precision 2/3
    assert(r.getDouble(4) == 0.666667) // recall 2/3
  }

  test("pairRecovery is NULL-safe on empty sides, not a division error") {
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val truth = Seq((1L, 2L)).toDF("id1", "id2")
    val r = Dedup.pairRecovery(empty, truth).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 0L, 0L)))
    assert(r.isNullAt(3) && r.getDouble(4) == 0.0)
  }
}
