package graft.operators

import graft.SparkSpec

/** FIM span assignment (p22): spans partition the token count, the
  * hash gate hits the rate, both orders appear for marked docs only,
  * and edge rates behave.
  */
class FimSplitSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, ("w " * (i % 50 + 1)).trim)).toDF("doc_id", "text")

  test("spans partition the token count and the gate hits the rate") {
    val out = Training.fimSplit(docs(2000), "doc_id", "text", fimRate = 0.5)
      .collect().map(r => (r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(out.forall { case (n, _, p, m, s, _) => p + m + s == n })
    val fim = out.filter(_._2)
    // md5 gate at 0.5 over 2000 ids: binomial mean 1000, sd ~22
    assert(fim.length > 900 && fim.length < 1100, fim.length)
    // marked docs split PSM/SPM only; unmarked pass through whole
    assert(fim.map(_._6).toSet == Set("psm", "spm"))
    assert(out.filterNot(_._2).forall { case (n, _, p, m, s, o) =>
      o == "none" && p == n && m == 0 && s == 0 })
    // middles of every size appear, including empty (uniform cuts)
    assert(fim.exists(_._4 == 0L) && fim.exists(_._4 > 10L))
  }

  test("rate 0 marks nothing, rate 1 marks everything, blanks are safe") {
    val none = Training.fimSplit(docs(50), "doc_id", "text", fimRate = 0.0)
      .collect()
    assert(none.forall(!_.getBoolean(2)))
    val blanks = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val all = Training.fimSplit(blanks, "doc_id", "text", fimRate = 1.0)
      .collect().map(r => (r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(all.forall { case (n, f, p, m, s) => n == 0L && f && p + m + s == 0L })
    intercept[IllegalArgumentException] {
      Training.fimSplit(docs(1), "doc_id", "text", fimRate = 1.5)
    }
  }
}
