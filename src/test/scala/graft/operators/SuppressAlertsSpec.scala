package graft.operators

import graft.SparkSpec

/** Alert suppression (r34): the kept-decision feedback a lag-gap
  * filter gets wrong.
  */
class SuppressAlertsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000L // one minute in micros

  test("suppression measures from the last SURVIVOR, not the last event") {
    // alerts at 0, 30, 70 minutes, window 60: t=30 suppressed (30 < 60
    // from survivor t=0); t=70 KEPT (70 >= 60 from survivor t=0) even
    // though its lag-gap from the previous EVENT is only 40 — the case
    // separating this from any lag-based filter
    val df = Seq((1L, 0L * M, 10L), (1L, 30L * M, 11L), (1L, 70L * M, 12L))
      .toDF("k", "ts", "id")
    val got = Windows.suppressAlerts(df, "k", "ts", "id", suppressSec = 3600L)
      .orderBy("ts_us").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(10L, 12L))
  }

  test("keys suppress independently; (ts, id) ties order deterministically") {
    val df = Seq(
      (1L, 0L, 10L), (1L, 0L, 9L),   // same instant: id 9 wins, 10 suppressed
      (2L, 0L, 20L)                   // other key untouched
    ).toDF("k", "ts", "id")
    val got = Windows.suppressAlerts(df, "k", "ts", "id", suppressSec = 1L)
      .orderBy("key", "id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 9L), (2L, 20L)))
  }

  test("exactly-at-boundary alerts survive (>= semantics)") {
    val df = Seq((1L, 0L, 1L), (1L, 3600L * 1000000L, 2L)).toDF("k", "ts", "id")
    val got = Windows.suppressAlerts(df, "k", "ts", "id", suppressSec = 3600L)
      .collect()
    assert(got.length == 2)
  }
}
