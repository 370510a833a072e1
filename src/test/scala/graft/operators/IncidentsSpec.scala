package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incidents + MTTR (r28): the summary must reconcile exactly with
  * the r23 edge stream it pairs up — fires counted, opens = fires
  * minus resolves, durations consistent with adjacent-edge pairing.
  */
class IncidentsSpec extends SparkSpec {

  test("incident totals reconcile with the alert-edge stream") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val byKey = Window.partitionBy("key").orderBy("hr_start")
    val edges = Windows.rateAnomaly(events, "ts", "event_type")
      .withColumn("_prev", lag(col("is_anomaly"), 1).over(byKey))
      .filter(col("is_anomaly") =!= coalesce(col("_prev"), lit(false)))
      .select(col("key"), col("hr_start"), col("is_anomaly"))
      .collect().groupBy(_.getString(0))
    val out = Windows.incidents(events, "ts", "event_type")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(out.nonEmpty, "no incidents at all — test is vacuous")
    for ((key, rows) <- edges) {
      val sorted = rows.sortBy(_.getLong(1))
      val fires = sorted.count(_.getBoolean(2))
      val resolves = sorted.length - fires
      val (nInc, nOpen, mttr, maxH) = out(key)
      assert(nInc == fires, s"$key: $nInc vs $fires fires")
      assert(nOpen == fires - resolves, s"$key: open $nOpen")
      // durations from explicit adjacent pairing
      val durs: Seq[Long] = sorted.map(r => (r.getLong(1), r.getBoolean(2)))
        .toList.sliding(2).collect {
          case List((t1, true), (t2, false)) => (t2 - t1) / 3600L
        }.toSeq
      if (durs.nonEmpty) {
        assert(maxH == durs.max, s"$key: max $maxH vs ${durs.max}")
        assert(math.abs(mttr - durs.sum.toDouble / durs.size) < 1e-6,
          s"$key: mttr $mttr vs ${durs.sum.toDouble / durs.size}")
      }
      // edges alternate: fire,resolve,fire,... starting with fire
      sorted.map(_.getBoolean(2)).zipWithIndex.foreach { case (an, i) =>
        assert(an == (i % 2 == 0), s"$key: edge $i breaks alternation")
      }
    }
  }
}
