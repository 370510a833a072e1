package graft.operators

import graft.SparkSpec

/** TF-IDF keyword extraction (t38): hand-computed scores, tie order,
  * the stopword-dies-by-idf property, and the k cut.
  */
class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private def rd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("scores match (tf/dl)*ln(N/df) and ties rank by term") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")).toDF("doc_id", "text")
    val out = Retrieval.tfidfTerms(docs, "doc_id", "text", k = 2)
      .orderBy("id", "rank").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getString(1)).toSeq == Seq("apple", "banana"), d1.mkString)
    assert(d1.head.getDouble(2) == rd6(2.0 / 3.0 * math.log(3.0)), d1.head)
    assert(d1(1).getDouble(2) == rd6(1.0 / 3.0 * math.log(1.5)), d1(1))
    // d2: banana and cherry tie exactly ((1/2)*ln(1.5)) -> term order
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getString(1)).toSeq == Seq("banana", "cherry"), d2.mkString)
    assert(d2.map(_.getDouble(2)).distinct.length == 1, d2.mkString)
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.map(_.getString(1)).toSeq == Seq("cherry", "date"), d3.mkString)
  }

  test("a term in every document scores zero; k cuts the list") {
    val docs = Seq(
      (1L, "the quick fox"),
      (2L, "the lazy dog"),
      (3L, "the end")).toDF("doc_id", "text")
    val out = Retrieval.tfidfTerms(docs, "doc_id", "text", k = 1)
      .collect()
    assert(out.length == 3, out.mkString)         // exactly one term per doc
    assert(out.forall(_.getString(1) != "the"), out.mkString)
    val all = Retrieval.tfidfTerms(docs, "doc_id", "text", k = 10).collect()
    assert(all.filter(_.getString(1) == "the").forall(_.getDouble(2) == 0.0),
      all.mkString)
    intercept[IllegalArgumentException] {
      Retrieval.tfidfTerms(docs, "doc_id", "text", 0)
    }
  }
}
