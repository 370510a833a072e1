package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Frequent-Directions top direction (s27): accuracy vs the exact
  * Gram direction where the exact pass can run, the Liberty/Ghashami
  * covariance error bound, and recovery BEYOND the exact pass's
  * d² ≤ 16384 contract.
  */
class FdSketchSpec extends SparkSpec {
  import spark.implicits._

  private def exactTopGram(vecs: Array[Array[Double]]): (Array[Double], Double) = {
    // exact uncentered AᵀA top eigenvector by driver power iteration
    val d = vecs(0).length
    val g = Array.ofDim[Double](d, d)
    vecs.foreach { x =>
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { g(i)(j) += x(i) * x(j); j += 1 }
        i += 1
      }
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var nm = 0.0
    for (_ <- 1 to 50) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
      nm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nm)
    }
    (v, nm)
  }

  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    math.abs(a.zip(b).map { case (x, y) => x * y }.sum) /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))

  test("near-optimal direction quality on the real (near-flat-spectrum) corpus") {
    // random embeddings have an almost flat spectrum, where NO sketch
    // can pin the top eigenVECTOR (the gap is tiny) — the honest
    // quality measure is the Rayleigh quotient: the FD direction must
    // capture almost as much mass as the true optimum
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val fd = Similarity.topPcFd(df, "vec_id", "embedding", ell = 32)
      .orderBy("pos").collect()
    val vFd = fd.map(_.getDouble(1))
    val vecs = df.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val (_, topEig) = exactTopGram(vecs)
    val d = vecs(0).length
    val rayleigh = {
      val g = Array.ofDim[Double](d, d)
      vecs.foreach { x =>
        for (i <- 0 until d; j <- 0 until d) g(i)(j) += x(i) * x(j)
      }
      (0 until d).map(i => (0 until d).map(j =>
        vFd(i) * g(i)(j) * vFd(j)).sum).sum /
        vFd.map(x => x * x).sum
    }
    assert(rayleigh / topEig > 0.9, s"rayleigh ratio ${rayleigh / topEig}")
    // the sketch's eigenvalue NEVER exceeds the exact one (B^T B <= A^T A)
    val n = vecs.length.toDouble
    assert(fd.head.getDouble(2) <= topEig / n * (1.0 + 1e-9))
    assert(fd.head.getDouble(3) > 0 && fd.head.getDouble(3) <= 1.0)
  }

  private def planted64(nRows: Int): Seq[(Long, Array[Double])] = {
    val d = 64
    val u = Array.tabulate(d)(i => math.cos(i * 0.61) / math.sqrt(d / 2.0))
    (0 until nRows).map { r =>
      val t = (r - nRows / 2) / 10.0
      (r.toLong, Array.tabulate(d) { i =>
        t * u(i) + (((r * 2654435761L + i * 40503L) % 1000L) - 500L) / 25000.0
      })
    }
  }

  test("recovers a planted 64-dim direction exactly where the spectrum has a gap") {
    val df = planted64(500).toDF("vec_id", "embedding")
    val fd = Similarity.topPcFd(df, "vec_id", "embedding", ell = 32)
      .orderBy("pos").collect().map(_.getDouble(1))
    val u = Array.tabulate(64)(i => math.cos(i * 0.61) / math.sqrt(32.0))
    assert(cos(fd.toSeq, u.toSeq) > 0.99, s"cos ${cos(fd.toSeq, u.toSeq)}")
  }

  test("the Liberty covariance bound holds: ||A'A - B'B||2 <= fro2/ell") {
    val ell = 16
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vecs = df.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val d = vecs(0).length
    // run the sketch through the real aggregate path
    val sk = df.select(graft.functions.FdAgg.sketch(
        col("embedding").cast("array<double>"), ell).as("g"))
      .head().getAs[Array[Byte]](0)
    val (dd, n, fro2, b) = graft.functions.FdAgg.parse(sk)
    assert(dd == d && n == vecs.length)
    val diff = Array.ofDim[Double](d, d)
    vecs.foreach { x =>
      for (i <- 0 until d; j <- 0 until d) diff(i)(j) += x(i) * x(j)
    }
    b.foreach { r =>
      for (i <- 0 until d; j <- 0 until d) diff(i)(j) -= r(i) * r(j)
    }
    // spectral norm of the (symmetric PSD) difference by power iteration
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var nm = 0.0
    for (_ <- 1 to 50) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => diff(i)(j) * v(j)).sum)
      nm = math.sqrt(w.map(x => x * x).sum)
      if (nm > 0) v = w.map(_ / nm)
    }
    assert(nm <= fro2 / ell * (1.0 + 1e-9),
      s"spectral norm $nm vs bound ${fro2 / ell}")
  }

  test("recovers a planted direction at d = 768 — past the exact-Gramian contract") {
    val d = 768
    val u = Array.tabulate(d)(i => math.sin(i * 0.37) / math.sqrt(d / 2.0))
    val rows = (0 until 400).map { r =>
      val t = (r - 200) / 10.0
      val noiseSeed = r * 2654435761L
      (r.toLong, Array.tabulate(d) { i =>
        val noise = (((noiseSeed + i * 40503L) % 1000L) - 500L) / 25000.0
        t * u(i) + noise
      })
    }
    val df = rows.toDF("vec_id", "embedding")
    // the exact pass refuses this width...
    val e = intercept[Exception] {
      Similarity.topPcPower(df, "vec_id", "embedding").collect()
    }
    assert(e.getMessage.contains("128-dim"), e.getMessage)
    // ...the sketch recovers the planted direction
    val fd = Similarity.topPcFd(df, "vec_id", "embedding", ell = 32)
      .orderBy("pos").collect().map(_.getDouble(1))
    assert(cos(fd.toSeq, u.toSeq) > 0.99, s"cos ${cos(fd.toSeq, u.toSeq)}")
  }

  test("partition layout changes the approximation, never the guarantee") {
    // on gapped data every merge tree lands on the same dominant
    // direction (on flat spectra only the Rayleigh mass is promised)
    val df = planted64(500).toDF("vec_id", "embedding")
    val a = Similarity.topPcFd(df.repartition(1), "vec_id", "embedding", ell = 32)
      .orderBy("pos").collect().map(_.getDouble(1))
    val b = Similarity.topPcFd(df.repartition(32), "vec_id", "embedding", ell = 32)
      .orderBy("pos").collect().map(_.getDouble(1))
    assert(cos(a.toSeq, b.toSeq) > 0.99)
  }
}
