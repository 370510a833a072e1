package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Top-PC power iteration (s21): the loading vector recovers a known
  * dominant direction, determinism holds across runs, and degenerate
  * inputs fail loudly. Hash-exactness vs the chained-CTE oracle is
  * the driver gate; this spec covers the linear-algebra quality the
  * oracle can't judge.
  */
class TopPcSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a planted dominant direction (|cos| > 0.99)") {
    // points spread along u = (3,4)/5 with small orthogonal noise:
    // top PC must align with u
    val u = Array(0.6, 0.8)
    val o = Array(-0.8, 0.6)
    val rows = (0 until 200).map { k =>
      val t = (k - 100) / 10.0          // dominant spread
      val e = ((k * 37) % 11 - 5) / 50.0 // small deterministic noise
      (k.toLong, Array((t * u(0) + e * o(0)).toFloat,
        (t * u(1) + e * o(1)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.topPcPower(df, "vec_id", "embedding")
      .orderBy("pos").collect()
    val v = out.map(_.getDouble(1))
    val cosU = math.abs(v(0) * u(0) + v(1) * u(1)) /
      math.sqrt(v(0) * v(0) + v(1) * v(1))
    assert(cosU > 0.99, s"loading ${v.mkString(",")} vs u ${u.mkString(",")}")
    // the dominant direction carries almost all variance
    val expl = out.head.getDouble(3)
    assert(expl > 0.95, s"explained_frac $expl")
  }

  test("pcProject: scores are centered and track the planted axis") {
    // same planted-direction corpus as above: the projection of row k
    // must be monotone in its dominant coordinate t, and mean ~ 0
    val u = Array(0.6, 0.8)
    val o = Array(-0.8, 0.6)
    val rows = (0 until 200).map { k =>
      val t = (k - 100) / 10.0
      val e = ((k * 37) % 11 - 5) / 50.0
      (k.toLong, Array((t * u(0) + e * o(0)).toFloat,
        (t * u(1) + e * o(1)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val sc = Similarity.pcProject(df, "vec_id", "embedding")
      .orderBy("id").collect().map(_.getDouble(1))
    val mean = sc.sum / sc.length
    assert(math.abs(mean) < 1e-3, s"mean $mean not centered")
    // |score| range ~ |t| range (10): the axis coordinate, not noise
    assert(math.abs(sc(0)) > 9.0 && math.abs(sc(199)) > 9.0)
    assert(sc(0) * sc(199) < 0, "endpoints must sit on opposite sides")
    // monotone along k up to the small orthogonal noise
    val dir = math.signum(sc(199) - sc(0))
    val violations = (1 until 200).count(k => (sc(k) - sc(k - 1)) * dir < -0.2)
    assert(violations == 0, s"$violations large monotonicity violations")
  }

  test("deterministic: two runs produce identical rows") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.topPcPower(df, "vec_id", "embedding").collect().toSeq
    val b = Similarity.topPcPower(df, "vec_id", "embedding").collect().toSeq
    assert(a == b)
  }

  test("zero-variance corpus fails loudly, not a garbage direction") {
    val df = (1L to 10L).map(i => (i, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.topPcPower(df, "vec_id", "embedding").collect()
    }
    assert(e.getMessage.contains("zero covariance"), e.getMessage)
  }

  test("the 128-dim driver-matrix contract is enforced") {
    val df = Seq((1L, Array.fill(200)(1.0f)), (2L, Array.fill(200)(2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.topPcPower(df, "vec_id", "embedding").collect()
    }
    assert(e.getMessage.contains("128-dim"), e.getMessage)
  }

  test("topKPcPower: deflation yields ordered, near-orthogonal components") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.topKPcPower(df, "vec_id", "embedding", k = 3)
      .orderBy("component", "pos").collect()
    val byComp = out.groupBy(_.getLong(0)).view
      .mapValues(rs => (rs.map(_.getDouble(2)), rs.head.getDouble(3),
        rs.head.getDouble(4))).toMap
    assert(byComp.keySet == Set(1L, 2L, 3L))
    // every explained share positive, total at most 1 (they partition
    // the original trace); on this near-isotropic corpus the spectrum
    // is nearly degenerate, so exact monotonicity isn't guaranteed by
    // 12 power rounds — the planted-spectrum test below pins ordering
    val expl = (1L to 3L).map(c => byComp(c)._3)
    assert(expl.forall(_ > 0) && expl.sum <= 1.0 + 1e-9, expl.toString)
    // deflation removes each direction: components pairwise
    // near-orthogonal. The loose bound reflects this corpus's nearly
    // degenerate spectrum (12 power rounds leave residual mixing when
    // eigenvalues almost tie); the planted-spectrum test pins < 0.01.
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (a <- 1L to 3L; b <- (a + 1) to 3L)
      assert(math.abs(dot(byComp(a)._1.toSeq, byComp(b)._1.toSeq)) < 0.1,
        s"components $a,$b not orthogonal")
    // component 1 is exactly the k=1 trainer's output
    val top1 = Similarity.topPcPower(df, "vec_id", "embedding")
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq
    assert(byComp(1L)._1.toSeq == top1)
  }

  test("topKPcPower: a planted 3-axis spectrum comes out in variance order") {
    // orthogonal axes with stddevs 10, 5, 2 in 4 dims: deflation must
    // recover them in order with eigenvalues ~100, 25, 4
    val axes = Seq(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0))
    val sd = Seq(10.0, 5.0, 2.0)
    val rows = (0 until 300).map { r =>
      val ts = Seq(0, 1, 2).map(a => sd(a) * (((r * (a + 7) * 31) % 21) - 10) / 6.0)
      (r.toLong, Array.tabulate(4)(i =>
        ts.zip(axes).map { case (t, u) => t * u(i) }.sum.toFloat))
    }
    val out = Similarity.topKPcPower(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3)
      .orderBy("component", "pos").collect()
    val eigs = out.groupBy(_.getLong(0)).view.mapValues(_.head.getDouble(3))
    assert(eigs(1L) > eigs(2L) && eigs(2L) > eigs(3L), eigs.toMap.toString)
    // each component aligns with its planted axis, and the recovered
    // components are strictly orthogonal (the separated spectrum
    // converges fully in 12 rounds)
    val vs = (1 to 3).map(c =>
      out.filter(_.getLong(0) == c).sortBy(_.getLong(1)).map(_.getDouble(2)))
    for (c <- 1 to 3) {
      val v = vs(c - 1)
      val cos = math.abs(v.zip(axes(c - 1)).map { case (a, b) => a * b }.sum) /
        math.sqrt(v.map(x => x * x).sum)
      assert(cos > 0.99, s"component $c loadings ${v.mkString(",")}")
    }
    for (a <- 0 until 3; b <- (a + 1) until 3)
      assert(math.abs(vs(a).zip(vs(b)).map { case (x, y) => x * y }.sum) < 0.01,
        s"planted components ${a + 1},${b + 1} not orthogonal")
  }

  test("pcWhiten: unit variance per component, score tracks pcProject") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val w = Similarity.pcWhiten(df, "vec_id", "embedding", k = 3).collect()
    val n = df.count().toDouble
    for (c <- 1L to 3L) {
      val ws = w.filter(_.getLong(1) == c).map(_.getDouble(3))
      val mean = ws.sum / ws.length
      val variance = ws.map(x => (x - mean) * (x - mean)).sum / n
      // whitening divides by sqrt(eigenvalue) = the axis stddev, so the
      // whitened coordinate has ~unit variance (round-6 loadings leave
      // a small residual)
      assert(math.abs(variance - 1.0) < 0.05, s"component $c variance $variance")
      assert(math.abs(mean) < 1e-3, s"component $c mean $mean")
    }
    // component 1's raw score is pcProject's score up to the defined
    // centering difference (round-6 mean vs full-double mean: <= 1e-6
    // per coordinate, folded over d terms)
    val p = Similarity.pcProject(df, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val d = df.head().getAs[Seq[Float]]("embedding").length
    w.filter(_.getLong(1) == 1L).foreach { r =>
      assert(math.abs(r.getDouble(2) - p(r.getLong(0))) <= d * 1e-6 + 1e-9,
        s"vec ${r.getLong(0)}: ${r.getDouble(2)} vs ${p(r.getLong(0))}")
    }
  }
}
