package graft

import org.apache.spark.sql.functions._

/** The crawl-intake 100× probe (r18 verdict task 3): run the
  * r42 (gz JSONL) → r43 (WARC) → r44 (end-to-end intake) → r45 (HTTP
  * framing) chain at 1× and at 100× docs (Gen10x unique mode), with
  * the archive REBUILD EXCLUDED from the measured wall — the
  * fixtures are memoized per (session, sfDir), so the warm run pays
  * the one-time build and the measured runs scan the same on-disk
  * shards a production run would. The r17 reading (3.04× at 10×) was
  * rebuild-inclusive and unreadable as scan evidence; this probe
  * reports per-doc scan cost, which must FALL with scale.
  *
  * Usage: runMain graft.IntakeChainProbe [dir1x] [dir100x] [outJson]
  */
object IntakeChainProbe {
  def main(args: Array[String]): Unit = {
    val d1 = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val d100 = args.lift(1).getOrElse("/tmp/genu100_sf01_docs")
    val out = args.lift(2).getOrElse("/tmp/intake_probe.json")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc(); Thread.sleep(200)
    }
    def time(name: String, dir: String): (Double, Double) = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup(); dt
      }
      val build = once() // warm: one-time fixture build + codegen
      (math.min(once(), once()), build)
    }
    val keys = Seq("r42_jsonl_gz", "r43_warc", "r44_crawl_intake",
      "r45_http_frame")
    def docs(dir: String): Long =
      spark.read.parquet(s"$dir/documents.parquet").count()
    val (n1, n100) = (docs(d1), docs(d100))
    val rows = keys.map { k =>
      val (s1, b1) = time(k, d1)
      val (s100, b100) = time(k, d100)
      val (pd1, pd100) = (s1 * 1e6 / n1, s100 * 1e6 / n100)
      println(f"[intake] $k%-16s 1x=$s1%6.2fs 100x=$s100%7.2fs " +
        f"per_doc_us 1x=$pd1%7.2f 100x=$pd100%7.2f (build walls $b1%.1f/$b100%.1f)")
      (k, s1, s100, pd1, pd100)
    }
    def num(v: Double) = f"$v%.2f".replace(",", ".")
    val json = rows.map { case (k, s1, s100, p1, p100) =>
      s""""$k":{"sec_1x":${num(s1)},"sec_100x":${num(s100)},""" +
        s""""per_doc_us_1x":${num(p1)},"per_doc_us_100x":${num(p100)}}"""
    }.mkString(
      s"""{"dirs":{"1x":"$d1","100x":"$d100"},"docs":{"1x":$n1,"100x":$n100},""" +
        s""""cpus":${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")},""" +
        s""""note":"archive rebuild excluded: fixtures memoized per (session,dir), built in the warm run, measured runs scan the same on-disk shards","probes":{""",
      ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
