package graft.operators

import graft.SparkSpec

/** Incremental component resolution (d27): the contracted fold over
  * a stored labeling equals one-shot CC over all ids and all pairs —
  * including the hard case where a NEW doc bridges two OLD components
  * that were distinct yesterday.
  */
class IncrementalCcSpec extends SparkSpec {
  import spark.implicits._

  private def oneShot(ids: Seq[Long], pairs: Seq[(Long, Long)]) =
    Dedup.components(ids.toDF("id"), "id", pairs.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def incr(oldIds: Seq[Long], oldPairs: Seq[(Long, Long)],
                   newIds: Seq[Long], newPairs: Seq[(Long, Long)]) = {
    val store = Dedup.components(oldIds.toDF("id"), "id",
        oldPairs.toDF("id1", "id2"))
      .select("id", "component")
    Dedup.incrementalComponents(store, newIds.toDF("id"), "id",
        newPairs.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a new doc bridging two old components merges them to the global min") {
    // yesterday: {1,2} and {5,6} distinct; today doc 10 links both
    val got = incr(
      oldIds = Seq(1L, 2L, 5L, 6L, 8L),
      oldPairs = Seq((1L, 2L), (5L, 6L)),
      newIds = Seq(10L, 11L),
      newPairs = Seq((10L, 2L), (10L, 6L)))
    val want = oneShot(Seq(1L, 2L, 5L, 6L, 8L, 10L, 11L),
      Seq((1L, 2L), (5L, 6L), (10L, 2L), (10L, 6L)))
    assert(got == want, s"got $got want $want")
    // the merged cluster carries the GLOBAL min label
    assert(got(6L) == 1L && got(10L) == 1L)
    // untouched old component and unpaired new id keep their labels
    assert(got(8L) == 8L && got(11L) == 11L)
  }

  test("new-new pairs and old-touching pairs compose in one fold") {
    val got = incr(
      oldIds = Seq(1L, 2L, 3L),
      oldPairs = Seq((2L, 3L)),
      newIds = Seq(20L, 21L, 22L, 23L),
      newPairs = Seq((20L, 21L), (22L, 3L)))
    val want = oneShot(Seq(1L, 2L, 3L, 20L, 21L, 22L, 23L),
      Seq((2L, 3L), (20L, 21L), (22L, 3L)))
    assert(got == want, s"got $got want $want")
    assert(got(22L) == 2L && got(21L) == 20L && got(23L) == 23L)
  }

  test("a re-sent id (already in the store) keeps one row, not two") {
    val store = Seq((1L, 1L), (2L, 1L)).toDF("id", "component")
    val out = Dedup.incrementalComponents(store,
        Seq(2L, 5L).toDF("id"), "id",
        Seq((5L, 2L)).toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length == 3, out.mkString(","))
    assert(out.toMap == Map(1L -> 1L, 2L -> 1L, 5L -> 1L), out.mkString(","))
  }

  test("the output is a valid store for the NEXT incremental round") {
    val r1 = incr(
      oldIds = Seq(1L, 2L), oldPairs = Seq((1L, 2L)),
      newIds = Seq(5L, 6L), newPairs = Seq((5L, 6L)))
    // round 2: fold a doc linking the two clusters, using r1 as store
    val store2 = r1.toSeq.toDF("id", "component")
    val got = Dedup.incrementalComponents(store2, Seq(9L).toDF("id"), "id",
        Seq((9L, 2L), (9L, 5L)).toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = oneShot(Seq(1L, 2L, 5L, 6L, 9L),
      Seq((1L, 2L), (5L, 6L), (9L, 2L), (9L, 5L)))
    assert(got == want, s"got $got want $want")
  }
}
