package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCountWs handles blanks and runs of whitespace") {
    val out = Seq("a b  c", "  ", "", "one").toDF("t")
      .select(TextFunctions.tokenCountWs(col("t"))).as[Long].collect()
    assert(out.toSeq == Seq(3L, 0L, 0L, 1L))
  }

  test("tokenCountBpeish splits letter/digit/other runs") {
    val out = Seq("hello world 123!", "a1b").toDF("t")
      .select(TextFunctions.tokenCountBpeish(col("t"))).as[Long].collect()
    // "hello"," world"," 123","!" = 4 ; "a","1","b" = 3
    assert(out.toSeq == Seq(4L, 3L))
  }

  test("langId picks the dominant stopword language, und when none") {
    val out = Seq(
      "the cat of the house and a dog",
      "el perro de la casa y los gatos",
      "qwerty zxcvb").toDF("t")
      .select(TextFunctions.langId(col("t"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("langId reaches zh on unsegmented Chinese text (no whitespace)") {
    // real Chinese has no word separators: token-set intersection sees
    // one giant token, so zh markers must match by substring containment
    val out = Seq(
      "我在这里有一个测试的句子",  // contains 的,在,我,有 markers
      "这是了不起的成就",          // contains 是,了,的
      "the plain english text").toDF("t")
      .select(TextFunctions.langId(col("t"))).as[String].collect()
    assert(out.toSeq == Seq("zh", "zh", "en"))
  }

  test("topTokenFraction (row-local) agrees with TextStats.repetition (exploded)") {
    val docs = Seq(
      (1L, "click here click here click here"),
      (2L, "a fresh take on six distinct words"),
      (3L, "one"),
      (4L, "")).toDF("doc_id", "text")
    val viaExpr = docs
      .select(col("doc_id"), TextFunctions.topTokenFraction(col("text")).as("f"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val viaAgg = graft.operators.TextStats.repetition(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // TextStats rounds to 6 decimals; compare at that precision.
    // Empty text is the one documented divergence: the aggregate keeps
    // SQL split semantics ("" -> one empty token -> 1.0, matching the
    // DuckDB oracle), while the row-local gate expression scores it 0.0
    // so curation drops empty docs for low quality, not "repetition".
    viaAgg.filterNot(_._1 == 4L).foreach { case (id, f) =>
      assert(math.abs(viaExpr(id) - f) < 5e-7,
        s"doc $id: expr ${viaExpr(id)} vs agg $f") }
    assert(viaExpr(1L) == 0.5)
    assert(viaExpr(4L) == 0.0)
    assert(viaAgg(4L) == 1.0)
  }

  test("qualityScore is bounded and favors clean prose") {
    val clean = ("the quick brown fox jumps over the lazy dog " * 5).trim
    val junk = "@@## !! ~~ ** %% ^^"
    val out = Seq(clean, junk).toDF("t")
      .select(TextFunctions.qualityScore(col("t"))).as[Double].collect()
    assert(out(0) > 0.8 && out(0) <= 1.0)
    assert(out(1) < 0.4)
  }
}

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("fnv1a matches the reference constants") {
    // FNV-1a 64 of empty input is the offset basis; of "a" a known value
    assert(RollingHash.fnv1a(Array.emptyByteArray) == 0xcbf29ce484222325L)
    assert(RollingHash.fnv1a("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
  }

  test("expression evaluates via SQL registration and codegen") {
    RollingHash.register(spark)
    val out = Seq("a", "abc", "a").toDF("t")
      .selectExpr("rolling_hash(t) AS h").as[Long].collect()
    assert(out(0) == 0xaf63dc4c8601ec8cL)
    assert(out(0) == out(2))
    assert(out(0) != out(1))
  }
}

class RegexGroupsSpec extends SparkSpec {
  import spark.implicits._

  test("extracts all groups in one pass, null row on no match") {
    val out = Seq("k=1 v=two", "nope").toDF("s")
      .select(RegexGroups(col("s"), """k=(\d+) v=(\w+)""", 2).as("g"))
    val rows = out.collect()
    assert(rows(0).getStruct(0).getString(0) == "1")
    assert(rows(0).getStruct(0).getString(1) == "two")
    assert(rows(1).isNullAt(0))
  }

  test("optional unmatched group is null inside the struct") {
    val out = Seq("x=5").toDF("s")
      .select(RegexGroups(col("s"), """x=(\d+)(?: y=(\d+))?""", 2).as("g"))
      .head().getStruct(0)
    assert(out.getString(0) == "5")
    assert(out.isNullAt(1))
  }
}

class MinHashAggSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("signature is k long, deterministic, and element-wise min-mergeable") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"))
      .toDF("id", "tok").withColumn("h", xxhash64(col("tok")))
    val sigs = df.groupBy("id")
      .agg(graft.functions.MinHashAgg.sig(col("h"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length == 16 && sigs(2L).length == 16)
    // group 1 ⊇ group 2, so sig1 <= sig2 element-wise (min over superset)
    assert(sigs(1L).zip(sigs(2L)).forall { case (a, b) => a <= b })
    // identical input -> identical signature (no RNG anywhere)
    val again = df.filter(col("id") === 1L).groupBy("id")
      .agg(graft.functions.MinHashAgg.sig(col("h"), 16).as("sig"))
      .head.getSeq[Long](1)
    assert(again == sigs(1L))
  }
}

class HeavyHittersSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("exact when k exceeds cardinality; bounded undercount when it doesn't") {
    val items = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(5)("c")).toDF("x")
    val exact = items.agg(graft.functions.HeavyHittersAgg.top(col("x"), 8).as("hh"))
      .select(explode(col("hh"))).select("col.item", "col.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(exact == Seq(("a", 50L), ("b", 30L), ("c", 5L)))
    // k=2: "a" (freq 50/85 > 1/3) must survive with count >= 50 - 85/3
    val approx = items.repartition(4).agg(graft.functions.HeavyHittersAgg.top(col("x"), 2).as("hh"))
      .select(explode(col("hh"))).select("col.item", "col.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(approx.contains("a") && approx("a") >= 50L - 85L / 3)
  }
}

class MinHashConsistencySpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("aggregate and row-local signatures agree on the same base hashes") {
    val hs = Seq(11L, 22L, 33L, 44L)
    val viaAgg = hs.map(h => (1L, h)).toDF("id", "h")
      .groupBy("id").agg(graft.functions.MinHashAgg.sig(col("h"), 12).as("sig"))
      .head.getSeq[Long](1)
    val viaRow = Seq(Tuple1(hs)).toDF("hs")
      .select(graft.functions.MinHashRow.sig(col("hs"), 12).as("sig"))
      .head.getSeq[Long](0)
    assert(viaAgg == viaRow)
  }
}

class ShingleStringsSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("compiled grams are byte-identical to the transform/slice/concat_ws combinator") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "the quick brown fox jumps",
      "a b",
      "one",                       // shorter than n: no grams
      "  leading and trailing  ",  // empty tokens from split survive as-is
      "").toDF("text")
      .withColumn("_toks", split(lower(col("text")), "\\s+"))
    for (n <- Seq(2, 3)) {
      val compiled = docs.select(
        graft.functions.ShingleStrings.of(col("_toks"), n).as("g"))
        .collect().map(_.getSeq[String](0)).toSeq
      val combinator = docs.select(
        when(size(col("_toks")) >= n,
          transform(sequence(lit(1), size(col("_toks")) - (n - 1)),
            i => concat_ws(" ", slice(col("_toks"), i, lit(n)))))
          .otherwise(array().cast("array<string>")).as("g"))
        .collect().map(_.getSeq[String](0)).toSeq
      assert(compiled == combinator, s"n=$n: $compiled vs $combinator")
    }
  }
}
