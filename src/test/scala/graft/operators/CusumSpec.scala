package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** CUSUM changepoint chart (r30): the closed form matches the
  * textbook recursion exactly, a sustained small drift that never
  * trips a per-hour threshold accumulates to a signal, noise resets,
  * and warmup/baseline edges behave.
  */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def at(day: Int, hour: Int, i: Int) =
    Timestamp.valueOf(f"2026-01-0$day%d $hour%02d:${i % 60}%02d:${(i * 7) % 60}%02d")

  private def events(key: String, perHour: Seq[Int]) =
    for {
      (n, h) <- perHour.zipWithIndex
      i <- 1 to n
    } yield (at(1 + h / 24, h % 24, i), key)

  /** Textbook recursion S_t = max(0, S_{t-1} + x_t - k) in micros. */
  private def recursion(counts: Seq[Long], bm: Long, slackDen: Long): Seq[Long] = {
    val k = bm + bm / slackDen
    counts.scanLeft(0L)((s, c) => math.max(0L, s + c * 1000000L - k)).tail
  }

  test("closed-form windows reproduce the textbook recursion bit-for-bit") {
    // noisy counts around 10 with a level shift to 14 at hour 36
    val per = Seq.tabulate(48)(h =>
      if (h < 36) 10 + (h % 3) - 1 else 14 + (h % 2))
    val df = events("a", per).toDF("ts", "event_type")
    val out = Windows.cusumChangepoint(df, "ts", "event_type")
      .orderBy("hr_start").collect()
    assert(out.length == 24, out.length) // 48 hours - 24 warmup
    val bm = out.head.getLong(3)
    val expected = recursion(per.drop(24).map(_.toLong), bm, 4L)
    assert(out.map(_.getLong(4)).toSeq == expected)
  }

  test("a sustained 30% drift signals while hourly z-noise does not") {
    // baseline 100/hour for 24h, then 130/hour: each hour's deviation
    // over the 1.25x allowance is +5e6 micros; after ~100 hours the
    // sum crosses h = 5e8 — the chart integrates what a per-hour
    // threshold never sees
    val per = Seq.fill(24)(100) ++ Seq.fill(110)(130)
    val df = events("drift", per).toDF("ts", "event_type")
    val out = Windows.cusumChangepoint(df, "ts", "event_type")
      .orderBy("hr_start").collect()
    assert(out.head.getLong(3) == 100000000L) // baseline 100 in micros
    val firstChange = out.indexWhere(_.getBoolean(5))
    assert(firstChange > 50 && firstChange < 110,
      s"drift should signal late but within the run, got $firstChange")
    // once signalled it stays signalled (the drift persists)
    assert(out.drop(firstChange).forall(_.getBoolean(5)))
  }

  test("noise at the baseline resets the sum and never signals") {
    val per = Seq.tabulate(96)(h => 10 + (h % 3) - 1) // 9..11 around 10
    val df = events("flat", per).toDF("ts", "event_type")
    val out = Windows.cusumChangepoint(df, "ts", "event_type").collect()
    assert(out.nonEmpty && out.forall(!_.getBoolean(5)))
    // the clamp works: the sum never goes negative
    assert(out.forall(_.getLong(4) >= 0L))
  }

  test("keys shorter than warmup emit nothing; params validate") {
    val df = events("short", Seq.fill(10)(5)).toDF("ts", "event_type")
    assert(Windows.cusumChangepoint(df, "ts", "event_type").count() == 0L)
    intercept[IllegalArgumentException] {
      Windows.cusumChangepoint(df, "ts", "event_type", warmupHours = 0)
    }
    intercept[IllegalArgumentException] {
      Windows.cusumChangepoint(df, "ts", "event_type", slackDen = 0)
    }
  }
}
