package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: cold/warm per-query timing against SPARK_GRAFT_SF_DIR. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("32").appName("prof").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"PROF $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
