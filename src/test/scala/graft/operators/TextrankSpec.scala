package graft.operators

import graft.SparkSpec

/** TextRank keywords (t45): the co-occurrence hub must outrank
  * satellites, self-pairs drop, and the cut is total-ordered.
  */
class TextrankSpec extends SparkSpec {
  import spark.implicits._

  test("the hub word outranks its satellites; scores sum to ~1") {
    // star corpus: "hub" co-occurs with every satellite, satellites
    // only with hub — hub's rank must be the maximum
    val docs = Seq("hub aa", "hub bb", "hub cc", "hub dd", "hub ee")
      .toDF("text")
    val rows = TextStats.textrank(docs, "text", vocab = 10, topK = 10)
      .collect()
    assert(rows.head.getString(1) == "hub", rows.map(_.getString(1)).toSeq)
    assert(rows.length == 6)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-6)
  }

  test("repeated-word self pairs drop; isolated vocab words never rank") {
    // "solo" repeats (self-pair only) and never meets another vocab
    // word: it must not appear in the graph at all
    val docs = Seq("solo solo solo", "alpha beta", "beta alpha").toDF("text")
    val rows = TextStats.textrank(docs, "text", vocab = 10, topK = 10)
      .collect()
    assert(!rows.exists(_.getString(1) == "solo"))
    assert(rows.map(_.getString(1)).toSet == Set("alpha", "beta"))
    // symmetric 2-node graph: equal ranks, tie broken by token
    assert(rows.map(_.getString(1)).toSeq == Seq("alpha", "beta"))
    assert(rows(0).getDouble(2) == rows(1).getDouble(2))
  }

  test("the vocab cap prunes the graph to the top tokens by frequency") {
    val docs = Seq.fill(5)("big big big small tiny").toDF("text")
    // vocab=2 keeps {big, small} (freq 15, 5); "tiny" is cut
    val rows = TextStats.textrank(docs, "text", vocab = 2, topK = 10)
      .collect()
    assert(rows.map(_.getString(1)).toSet == Set("big", "small"))
  }
}
