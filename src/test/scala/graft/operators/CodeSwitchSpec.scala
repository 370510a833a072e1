package graft.operators

import graft.SparkSpec

/** Code-switching detector (t40): mixed-language docs flag with the
  * right dominant language and share; monolingual docs stay quiet;
  * the tie-break is deterministic.
  */
class CodeSwitchSpec extends SparkSpec {
  import spark.implicits._

  test("a two-language doc flags mixed with the right dominant share") {
    val mixed = "the cat is in the house. der hund ist von der die das. " +
      "the dog is of the sea. the fox is in a den."
    val mono = "the cat is a cat. the dog is a dog. the end is the end."
    val df = Seq((1L, mixed), (2L, mono)).toDF("doc_id", "text")
    val out = TextStats.codeSwitch(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    assert(out(1L) == ((4L, 2L, "en", 0.75, true)), out(1L))
    assert(out(2L) == ((3L, 1L, "en", 1.0, false)), out(2L))
  }

  test("an even 50/50 split ties to the lexicographically smaller language") {
    val df = Seq((1L,
      "der hund ist von der die das. the cat is in the sea of a fox."))
      .toDF("doc_id", "text")
    val r = TextStats.codeSwitch(df, "doc_id", "text").collect().head
    assert(r.getLong(2) == 2L && r.getString(3) == "de", r)
    assert(r.getDouble(4) == 0.5 && r.getBoolean(5), r)
  }
}
