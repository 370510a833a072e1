package graft.operators

import graft.SparkSpec

/** Interpolated Kneser-Ney bigram score (t41): matches a direct
  * reference implementation to the rounding contract, and the
  * continuation-diversity property (the "san francisco" effect)
  * holds.
  */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private val D = 0.75

  /** Direct KN over a doc list: mean of per-pair rounded logprobs. */
  private def reference(docs: Seq[(String, String)]): Map[String, (Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val pairs = toks.flatMap { case (id, ts) =>
      if (ts.length >= 2) ts.sliding(2).map(p => (id, p.head, p(1))).toSeq else Nil
    }
    val nb = pairs.groupBy(p => (p._2, p._3)).map { case (k, v) => k -> v.size.toLong }
    val np = pairs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val t1 = nb.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val cont = nb.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val bb = nb.size.toLong
    def lpMicros(w1: String, w2: String): Long = {
      val p = (nb((w1, w2)) - D) / np(w1) +
        D * t1(w1) / np(w1) * (cont(w2).toDouble / bb)
      (BigDecimal(math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * 1000000).toLongExact
    }
    pairs.groupBy(_._1).map { case (id, ps) =>
      val s = ps.map(p => lpMicros(p._2, p._3)).sum
      val n = ps.size.toLong
      id -> (n, -(((-s) * 2 + n) / (2 * n)).toDouble / 1000000.0)
    }
  }

  private def run(docs: Seq[(String, String)]) =
    TextStats.kneserNey(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("matches the direct reference on a mixed corpus") {
    val docs = Seq(
      "a" -> "the cat sat on the mat",
      "b" -> "the dog sat on the rug",
      "c" -> "san francisco is in california",
      "d" -> "the cat and the dog ran",
      "e" -> "one",                        // too short: drops
      "f" -> "  ")
    val out = run(docs)
    val want = reference(docs)
    assert(out.keySet == want.keySet)
    for ((id, (n, m)) <- want) {
      assert(out(id)._1 == n, s"$id n_bigrams")
      assert(math.abs(out(id)._2 - m) < 2e-6, s"$id: got ${out(id)._2} want $m")
    }
  }

  test("continuation diversity beats raw frequency (the francisco effect)") {
    // "francisco" appears 4 times but ONLY after "san"; "road" appears
    // 4 times after 4 distinct words. Under KN the unseen-context
    // backoff mass for "road" must exceed "francisco"'s even though
    // their raw counts tie — scored via docs that pair each with a
    // shared common prefix "the" (both pairs unseen... here both ARE
    // seen once, so compare the continuation term directly through
    // the interpolated score of otherwise-identical pairs)
    val docs = Seq(
      "t1" -> "san francisco san francisco san francisco san francisco",
      "t2" -> "main road side road long road short road",
      "q1" -> "the francisco",
      "q2" -> "the road")
    val out = run(docs)
    // both query pairs have nb=1 and share prefix stats ("the" has
    // exactly two continuations, both count 1) — the only difference
    // is cont(w2): road completes 4+1 distinct contexts, francisco 2
    assert(out("q2")._2 > out("q1")._2,
      s"diverse continuation should score higher: ${out("q2")._2} vs ${out("q1")._2}")
  }

  test("bad discount fails loudly") {
    val df = Seq(("x", "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextStats.kneserNey(df, "doc_id", "text", discount = 1.0)
    }
  }
}
