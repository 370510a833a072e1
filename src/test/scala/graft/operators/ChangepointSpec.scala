package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Changepoint localization (r37): a planted shift recovers exactly,
  * ties break earliest, single-hour keys emit nothing.
  */
class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def events(rates: Seq[(Long, Int)], key: String = "k") =
    rates.flatMap { case (h, r) =>
      Seq.fill(r)((key, new Timestamp(h * 3600L * 1000L)))
    }.toDF("k", "ts")

  test("a planted level shift localizes to the exact boundary hour") {
    // 20 hours at 5/hr then 20 at 50/hr: the optimal split is after
    // hour 19, means exactly 5 and 50
    val df = events((0L until 20L).map((_, 5)) ++ (20L until 40L).map((_, 50)))
    val row = Windows.changepoint(df, "ts", "k").collect().head
    assert(row.getLong(1) == 19L * 3600L, row.toString)
    assert(row.getDouble(4) == 5.0 && row.getDouble(5) == 50.0, row.toString)
    assert(row.getLong(2) == 20L && row.getLong(3) == 20L)
  }

  test("gain ties break to the earliest hour; 1-hour keys emit nothing") {
    // symmetric series 9,5,5,9: splits after h0 and after h2 tie
    // (mirror images) -> the earliest boundary wins
    val df = events(Seq((0L, 9), (1L, 5), (2L, 5), (3L, 9)))
    val row = Windows.changepoint(df, "ts", "k").collect().head
    assert(row.getLong(1) == 0L, row.toString)
    val single = Windows.changepoint(events(Seq((0L, 7))), "ts", "k")
    assert(single.count() == 0L, "no candidate split exists for one hour")
  }
}
