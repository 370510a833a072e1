package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Alert-storm correlation (r29): storms must partition the fire-edge
  * stream exactly at the > gapHours boundaries, and the per-storm
  * summary must reconcile with the raw fires.
  */
class AlertStormsSpec extends SparkSpec {

  test("storms partition the fire stream at gap boundaries, totals reconcile") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val byKey = Window.partitionBy("key").orderBy("hr_start")
    val fires = Windows.rateAnomaly(events, "ts", "event_type")
      .withColumn("_prev", lag(col("is_anomaly"), 1).over(byKey))
      .filter(col("is_anomaly") =!= coalesce(col("_prev"), lit(false)))
      .filter(col("is_anomaly"))
      .select(col("key"), col("hr_start"))
      .collect().map(r => (r.getLong(1), r.getString(0)))
      .sortBy(identity)
    assert(fires.nonEmpty, "no fire edges — test is vacuous")
    // reference partition: split the globally ordered fires at > 2h
    val expected = fires.tail.foldLeft(Vector(Vector(fires.head))) {
      case (acc, f) =>
        if (f._1 - acc.last.last._1 > 2L * 3600L) acc :+ Vector(f)
        else acc.init :+ (acc.last :+ f)
    }
    val got = Windows.alertStorms(events, "ts", "event_type", gapHours = 2)
      .orderBy("storm_start").collect()
    assert(got.length == expected.length,
      s"${got.length} storms vs ${expected.length} expected")
    got.zip(expected).foreach { case (r, fs) =>
      assert(r.getLong(0) == fs.head._1 && r.getLong(1) == fs.last._1,
        s"storm bounds ${r.getLong(0)}..${r.getLong(1)} vs $fs")
      assert(r.getLong(2) == fs.length, s"n_fires ${r.getLong(2)} vs $fs")
      assert(r.getLong(3) == fs.map(_._2).distinct.length, "n_keys")
      assert(r.getLong(4) == (fs.last._1 - fs.head._1) / 3600L, "span_hours")
      assert(r.getString(5) == fs.map(_._2).distinct.sorted.mkString(","),
        s"keys ${r.getString(5)}")
    }
    // every fire lands in exactly one storm
    assert(got.map(_.getLong(2)).sum == fires.length)
  }

  test("a cross-key burst is ONE storm; a gap past gapHours splits") {
    val s = spark
    import s.implicits._
    // two keys firing in the same tight window, then a distant fire.
    // build raw events whose rateAnomaly yields exactly those fires:
    // 24 flat hours then a spike — per key, offset the far spike
    def hourly(key: String, spikes: Seq[Long]): Seq[(String, Long)] =
      ((0L until 24L).flatMap(h => (1 to 10).map(i => (key, h * 3600L + i))) ++
        spikes.flatMap { sh =>
          // quiet hours between spikes keep the trailing window sane
          (1 to 60).map(i => (key, sh * 3600L + i))
        }) ++ ((24L until 40L).filterNot(h => spikes.contains(h))
          .flatMap(h => (1 to 10).map(i => (key, h * 3600L + i))))
    val rows = hourly("svc_a", Seq(25L)) ++ hourly("svc_b", Seq(26L)) ++
      hourly("svc_c", Seq(35L))
    val df = rows.toDF("event_type", "epoch")
      .withColumn("ts", timestamp_seconds(col("epoch")))
    val storms = Windows.alertStorms(df, "ts", "event_type", gapHours = 2)
      .orderBy("storm_start").collect()
    // svc_a@25 and svc_b@26 merge (gap 1h <= 2h); svc_c@35 is its own
    val burst = storms.find(_.getLong(0) == 25L * 3600L)
    assert(burst.isDefined, storms.mkString("\n"))
    assert(burst.get.getLong(3) >= 2L, s"burst keys ${burst.get.getString(5)}")
    assert(burst.get.getString(5).contains("svc_a")
      && burst.get.getString(5).contains("svc_b"))
    val lone = storms.find(r => r.getString(5) == "svc_c")
    assert(lone.isDefined && lone.get.getLong(0) == 35L * 3600L,
      storms.mkString("\n"))
  }
}
