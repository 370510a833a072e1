package graft.operators

import graft.SparkSpec

/** Edit-distance-verified dedup (d30): the one-typo twin passes, a
  * rewrite fails, the clip bounds the DP, params validate.
  */
class EditVerifySpec extends SparkSpec {
  import spark.implicits._

  test("a one-typo twin verifies; an unrelated doc never pairs") {
    val base = "the quick brown fox jumps over the lazy dog and runs away fast"
    val typo = base.replace("jumps", "jumped")
    val docs = Seq(
      (1L, base), (2L, typo),
      (3L, "completely different content about database engines and storage"))
      .toDF("doc_id", "text")
    val out = Dedup.editVerifiedPairs(docs, "doc_id", "text",
        shingleN = 3, minSim = 0.8, clipChars = 256)
      .collect()
    assert(out.length == 1, out.mkString)
    val p = out.head
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L, p)
    // lev("jumps","jumped") inside the clip = 2 edits
    assert(p.getLong(2) == 2L, p)
    assert(p.getDouble(3) > 0.95, p)
  }

  test("the clip bounds the comparison: divergence past it is invisible") {
    // 60 distinct words (~280 chars) shared; the only difference is
    // the final word, which starts past the 256-char clip
    val head = (0 until 60).map(i => f"word$i%03d").mkString(" ")
    val docs = Seq(
      (1L, head + " endone"), (2L, head + " endtwo"))
      .toDF("doc_id", "text")
    val out = Dedup.editVerifiedPairs(docs, "doc_id", "text",
        shingleN = 3, minSim = 0.9, clipChars = 256)
      .collect()
    // identical first 256 chars -> lev 0, sim 1.0 (candidates fire on
    // the 57 shared shingles)
    assert(out.length == 1 && out.head.getLong(2) == 0L &&
      out.head.getDouble(3) == 1.0, out.mkString)
  }

  test("bad params fail loudly") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.editVerifiedPairs(df, "doc_id", "text", 3, 0.0, 256)
    }
    intercept[IllegalArgumentException] {
      Dedup.editVerifiedPairs(df, "doc_id", "text", 3, 0.5, 0)
    }
  }
}
