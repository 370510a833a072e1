package graft

/** Dev tool (r19): time one query under ad-hoc SQLConf overrides.
  * Usage: runMain graft.OptProbe <query> [key=value ...]
  * Runs warm + 3 measured noop writes, prints each and the median.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val confs = args.drop(1).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("optprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v); println(s"[conf] $k=$v") }
    def once(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      Thread.sleep(200)
      dt
    }
    once(); once(); once()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s
    }
    if (sys.env.get("SPARK_GRAFT_STAGES").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val i = sc.stageInfo
            val ms = (for {a <- i.completionTime; b <- i.submissionTime}
              yield a - b).getOrElse(-1L)
            stages.add((i.stageId, ms, i.name.take(80))); ()
          }
        })
    val raw = Seq.fill(5) {
      val s0 = {
        import scala.jdk.CollectionConverters._
        stages.asScala.map(_._2).sum
      }
      val g0 = gcMs
      val dt = once()
      val g1 = gcMs
      val s1 = {
        import scala.jdk.CollectionConverters._
        stages.asScala.map(_._2).sum
      }
      println(f"[run] wall=$dt%.2f stage=${(s1 - s0) / 1000.0}%.2f gc=${(g1 - g0) / 1000.0}%.2f")
      dt
    }
    val ts = raw.sorted
    println(f"[optprobe] $name runs=${raw.map(t => f"$t%.2f").mkString(",")} median=${ts(2)}%.2f s")
    if (!stages.isEmpty) {
      import scala.jdk.CollectionConverters._
      val top = stages.asScala.toSeq.sortBy(-_._2).take(25)
      top.foreach { case (id, ms, nm) => println(f"[stage] $id%5d ${ms / 1000.0}%7.2f s  $nm") }
      println(f"[stage] total=${stages.asScala.map(_._2).sum / 1000.0}%.1f s over ${stages.size} stages (5 runs)")
    }
    spark.stop()
  }
}
