package graft.operators

import graft.SparkSpec

/** Tokenizer fertility (t37): a language the merge table was
  * effectively trained FOR tokenizes near 1 token/word, while a
  * language whose pairs never won a merge stays character-split —
  * the multilingual context-budget inequity the audit exists to
  * surface.
  */
class BpeFertilitySpec extends SparkSpec {
  import spark.implicits._

  test("in-vocabulary language beats the unmerged one on both rates") {
    // lang x dominates training: every merge comes from the 'a' runs;
    // lang y's words (all-distinct adjacent pairs, count 1 each)
    // never win an argmax and stay fully character-split
    val xDocs = (1L to 20L).map(i => (i, "aaaa aaaa aaaa", "x"))
    val yDoc = Seq((100L, "bcdf ghjk mnpq rstv", "y"))
    val df = (xDocs ++ yDoc).toDF("doc_id", "text", "lang")
    val merges = TextStats.bpeTrain(df, "text", 8)
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    val out = TextStats.bpeFertility(df, "lang", "text", merges)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val (xw, xc, xb, xf, xcpt) = out("x")
    assert(xw == 60L && xc == 240L, out("x"))
    assert(xf < 1.5, s"merged language fertility $xf should approach 1")
    val (yw, yc, yb, yf, ycpt) = out("y")
    assert(yw == 4L && yc == 16L, out("y"))
    // once the dominant a-family exhausts, leftover merge capacity
    // falls to y's singleton pairs — y still ends far less merged
    assert(yb > yw && yf >= 2.0, out("y"))
    assert(xf < yf && xcpt > ycpt, s"x=$xf/$xcpt y=$yf/$ycpt")
  }
}
