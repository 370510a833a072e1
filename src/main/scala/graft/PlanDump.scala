package graft

/** Dev tool (r19 optimization round): dump `.explain("formatted")` for
  * the named queries to plans/<tag>/<name>_<suffix>.txt — the judge
  * checks plan claims against these committed files. Usage:
  *   runMain graft.PlanDump <tag> <suffix> <query...>
  * (e.g. `runMain graft.PlanDump r19 before q50_bootstrap_ci t45_textrank`)
  *
  * r20: plans are dumped PRE-SEAL (`graft.seal.skip=1` turns
  * Caching.sealOver into a pass-through) — the r19 dumps of sealed
  * queries were 5-node `Scan ExistingRDD` stubs because the eager
  * localCheckpoint had already truncated the lineage; these show the
  * full plan the query actually computes before sealing.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    System.setProperty("graft.seal.skip", "1")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .appName("plandump").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = new java.io.File(s"plans/$tag")
    outDir.mkdirs()
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        new java.io.File(outDir, s"${name}_$suffix.txt").toPath,
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote plans/$tag/${name}_$suffix.txt (${txt.length} chars)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
