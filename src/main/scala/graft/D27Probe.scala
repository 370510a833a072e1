package graft
import org.apache.spark.sql.functions._

/** The d27 watch-closure probe (r15, closing the r13/r14 carried
  * flag "d27 is ~1.35x its r12 wall — profile the per-batch
  * localCheckpoint churn"). Measures the full query wall repeatedly
  * (churn would show as growth across runs), counts AQE stage-jobs,
  * and times the three component stages separately. Findings are
  * recorded in SURVEY §6 (round-15 note): no churn — the wall is
  * fixed job-scheduling mass on a size-capped (500-doc) input, and
  * a fresh JVM runs SLOWER than any in-sweep reading, so the
  * round-over-round drift was JVM-warmth variance, not growth.
  */
object D27Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(200)
    }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[d27probe] $label%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs")
    }
    // whole query x3 (warm + 2 measured)
    for (i <- 1 to 3) {
      time(s"full_query_$i") {
        SparkEntry.queries("d27_incremental_cc")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      cleanup()
    }
    // job-count instrumentation: where do the eager jobs come from?
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size); ()
      }
    })
    time("counted_run") {
      SparkEntry.queries("d27_incremental_cc")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    println(s"[d27probe] jobs=${jobs.get} stages=${stages.get}")
    cleanup()
    // stage breakdown
    def T(t: String) = spark.read.parquet(s"$dir/$t.parquet")
    val docs = T("documents").filter(col("doc_id") < 500)
    val oldDocs = docs.filter(col("doc_id") < 250)
    val newDocs = docs.filter(col("doc_id") >= 250)
    import graft.operators.Dedup
    var store: org.apache.spark.sql.DataFrame = null
    var newPairs: org.apache.spark.sql.DataFrame = null
    time("old_pairs+components") {
      store = Dedup.components(oldDocs.select(col("doc_id")), "doc_id",
          Dedup.jaccardPairs(Dedup.shingles(oldDocs, "doc_id", "text", 3), 0.5))
        .select(col("doc_id").as("id"), col("component"))
      store.write.format("noop").mode("overwrite").save()
    }
    time("new_pairs") {
      newPairs = Dedup.jaccardPairs(Dedup.shingles(docs, "doc_id", "text", 3), 0.5)
        .filter(col("id1") >= 250 || col("id2") >= 250)
      newPairs.write.format("noop").mode("overwrite").save()
    }
    time("incremental_fold") {
      Dedup.incrementalComponents(store, newDocs.select(col("doc_id")), "doc_id", newPairs)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
