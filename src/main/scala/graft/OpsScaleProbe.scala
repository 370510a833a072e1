package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Scale probe for the heaviest NON-pipeline query families (round-14
  * item #8 — extends the Gen10x flat-scaling evidence beyond
  * CurateApp): runs each probe at 1x and at a Gen10x-stretched corpus
  * and records the wall-clock pair, so super-linear behavior in the
  * k-means, Kneser-Ney, and AllPairs families shows up as a ratio,
  * not a belief.
  *
  * Usage: runMain graft.OpsScaleProbe <dir1x> <dir10x> [outJson]
  *
  * Methodology matches Bench: warm run first (codegen + planning +
  * any memoized driver-side quantizer training land there), then the
  * MIN of two measured runs through the noop sink (min, not median,
  * because scale RATIOS are the product here and the min is the
  * stable estimator under one-sided noise). The five SparkEntry
  * probes run the production query verbatim; the d24 family probe
  * calls allPairsJaccard directly on the FULL documents table in the
  * d24b production configuration (tau=0.8, 3-gram, 64x guard),
  * because the query-form entries cap at 500 docs for the oracle and
  * a capped input cannot scale.
  */
object OpsScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OpsScaleProbe <dir1x> <dir10x> [outJson]")
    val (d1, d10) = (args(0), args(1))
    val out = if (args.length > 2) args(2) else "BENCH_OPS10X_r15.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64 * 1024 * 1024}")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window", org.apache.logging.log4j.Level.ERROR)

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      Thread.sleep(200)
    }
    def time(mk: () => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        dt
      }
      once() // warm
      math.min(once(), once())
    }

    val queryProbes = Seq("s29_kmeans_train", "s30_kmeans_prune",
      "s32_ivf_exact", "t41_kneser_ney", "t42_kn_buckets",
      // the graph family (r14): BFS/Bellman-Ford frontiers over the
      // 10x co-purchase graph and the iterative ops over 10x events —
      // frontier growth is where super-linearity would hide
      "q37_reachability", "q39_shortest_path", "q38_pagerank",
      "q40_communities",
      // r15: the big-graph twins — iterative PageRank/LPA whose
      // per-iteration joins run over the FULL co-purchase graph, so a
      // super-linear iteration shape cannot hide behind a small node
      // dictionary the way q38/q40's type graph allows
      "q38b_pagerank_big", "q40b_communities_big")
    def mk(name: String, dir: String): () => DataFrame =
      if (name == "d24_allpairs_full")
        // guard raised to 256x for the PROBE: the Gen10x corpus
        // duplicates every doc 10-fold, so its true candidate mass is
        // ~91x docs by construction (measured 4.57M over 50k docs) —
        // legitimate work here, exactly what d24b's production 64x cap
        // correctly refuses on an organic corpus
        () => graft.operators.Dedup.allPairsJaccard(
          spark.read.parquet(s"$dir/documents.parquet")
            .select(col("doc_id"), col("text")),
          "doc_id", "text", tau = 0.8, shingleN = 3,
          maxCandidateFactor = Some(256.0))
      else () => SparkEntry.queries(name)(spark, dir)

    // dev loop: SPARK_GRAFT_ONLY=q38b_pagerank_big probes a subset
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(queryProbes :+ "d24_allpairs_full")
    val rows = names.map { n =>
      val s1 = time(mk(n, d1))
      val s10 = time(mk(n, d10))
      println(f"[probe] $n%-22s 1x=$s1%6.1fs 10x=$s10%6.1fs ratio=${s10 / s1}%5.1f")
      (n, s1, s10)
    }
    def num(v: Double) = f"$v%.2f".replace(",", ".")
    val json = rows.map { case (n, s1, s10) =>
      s""""$n":{"sec_1x":${num(s1)},"sec_10x":${num(s10)},"ratio":${num(s10 / s1)}}"""
    }.mkString(
      s"""{"dirs":{"1x":"$d1","10x":"$d10"},"cpus":$cpus,"probes":{""", ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}
