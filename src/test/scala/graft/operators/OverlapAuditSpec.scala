package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** d22 cross-source KMV overlap audit: estimator exactness under k,
  * accuracy above k, and salt-phase invariance.
  */
class OverlapAuditSpec extends SparkSpec {
  import spark.implicits._

  test("union under k: the estimate IS the exact Jaccard") {
    // src A: {w1 w2 w3, w2 w3 w4}; src B: {w2 w3 w4}; J = 1/2
    val df = Seq(
      ("A", "w1 w2 w3 w4"),
      ("B", "w2 w3 w4")).toDF("source", "text")
    val out = Dedup.sourceOverlapKmv(df, "source", "text", k = 128).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("s1") == "A" && r.getAs[String]("s2") == "B")
    assert(r.getAs[Long]("k_eff") == 2L, "union holds 2 distinct shingles")
    assert(r.getAs[Long]("n_common") == 1L)
    assert(r.getAs[Double]("jaccard_est") == 0.5)
  }

  test("disjoint sources estimate 0; every unordered pair appears once") {
    val df = Seq(
      ("A", "a1 a2 a3 a4"),
      ("B", "b1 b2 b3 b4"),
      ("C", "c1 c2 c3 c4")).toDF("source", "text")
    val out = Dedup.sourceOverlapKmv(df, "source", "text", k = 16)
    assert(out.count() == 3L) // AB AC BC
    assert(out.filter(col("s1") >= col("s2")).count() == 0L)
    assert(out.filter(col("jaccard_est") =!= 0.0).count() == 0L)
  }

  test("sketched estimate (k << union) lands near the exact Jaccard") {
    // two long docs sharing a 300-token prefix; unique 150-token tails
    def words(tag: String, n: Int, from: Int = 0) =
      (from until from + n).map(i => s"$tag$i").mkString(" ")
    val shared = words("c", 300)
    val df = Seq(
      ("A", shared + " " + words("a", 150)),
      ("B", shared + " " + words("b", 150))).toDF("source", "text")
    val exact = {
      val sh = Dedup.shingles(df, "source", "text", 3)
      val a = sh.filter(col("id") === "A").select("shingle")
      val b = sh.filter(col("id") === "B").select("shingle")
      val inter = a.intersect(b).count().toDouble
      val union = a.union(b).distinct().count().toDouble
      inter / union
    }
    val est = Dedup.sourceOverlapKmv(df, "source", "text", k = 64)
      .collect().head.getAs[Double]("jaccard_est")
    // KMV std at k=64 is ~sqrt(J(1-J)/64) ~= 0.06; 4 sigma
    assert(math.abs(est - exact) < 0.25, s"est=$est exact=$exact")
  }

  test("partition layout never changes the answer (mergeable partials)") {
    val df = (0 until 40).map { i =>
      (s"s${i % 4}", (0 until 30).map(j => s"t${(i * 7 + j * 3) % 50}").mkString(" "))
    }.toDF("source", "text")
    val one = Dedup.sourceOverlapKmv(df.coalesce(1), "source", "text", k = 8)
    val many = Dedup.sourceOverlapKmv(df.repartition(13), "source", "text", k = 8)
    assert(one.exceptAll(many).count() == 0L && many.exceptAll(one).count() == 0L)
  }

  test("kmv_sketch: k smallest DISTINCT values, ascending, duplicates folded") {
    val vals = Seq("c", "a", "e", "a", "b", "d", "b").map(Tuple1(_)).toDF("v")
    val got = vals.repartition(3)
      .agg(graft.functions.KmvAgg.sketch(col("v"), 3).as("sk"))
      .collect().head.getSeq[String](0)
    assert(got == Seq("a", "b", "c"))
    // under k: the whole distinct set, still sorted
    val all = vals.agg(graft.functions.KmvAgg.sketch(col("v"), 99).as("sk"))
      .collect().head.getSeq[String](0)
    assert(all == Seq("a", "b", "c", "d", "e"))
  }
}
