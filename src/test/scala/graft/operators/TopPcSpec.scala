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
}
