package graft.operators

import graft.SparkSpec

/** Stratified interleaved training order (p19): rounds rotate across
  * sources, same-source runs stay bounded, small sources exhaust
  * early, and the order is reproducible.
  */
class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  test("equal sources: every round holds each source once; runs <= 2") {
    val docs = (1L to 30L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val ordd = Training.interleaveOrder(docs, "doc_id", "source")
      .orderBy("round", "ord")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    // each round contains all 3 sources exactly once
    ordd.groupBy(_._2).foreach { case (rnd, rows) =>
      assert(rows.map(_._1).toSet.size == 3, s"round $rnd: ${rows.mkString(",")}")
    }
    // same-source run length bounded by 2 (round boundaries only)
    val runs = ordd.map(_._1).foldLeft(List.empty[(String, Int)]) {
      case ((s, n) :: tl, x) if s == x => (s, n + 1) :: tl
      case (acc, x) => (x, 1) :: acc
    }
    assert(runs.forall(_._2 <= 2), runs.filter(_._2 > 2).mkString(","))
  }

  test("a small source exhausts early; later rounds shrink") {
    val docs = ((1L to 5L).map(i => (i, "big")) ++ Seq((10L, "tiny")))
      .toDF("doc_id", "source")
    val byRound = Training.interleaveOrder(docs, "doc_id", "source")
      .collect().map(r => r.getLong(2) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byRound(1L) == Set("big", "tiny"))
    for (r <- 2L to 5L) assert(byRound(r) == Set("big"), s"round $r")
  }

  test("the order is a pure function of ids: reruns are identical") {
    val docs = (1L to 40L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val a = Training.interleaveOrder(docs, "doc_id", "source")
      .orderBy("round", "ord").collect().map(_.getLong(0)).toSeq
    val b = Training.interleaveOrder(docs, "doc_id", "source")
      .orderBy("round", "ord").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
