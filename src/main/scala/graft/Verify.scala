package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // tolerate any arity — a harness passing extra/missing args must not
    // turn into an instant MatchError and an empty correctness round
    val sfDir = args.lift(0).filter(_.nonEmpty)
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val outDir = args.lift(1).filter(_.nonEmpty).getOrElse("/tmp/verify_out")
    // make silent-default runs identifiable in harness logs: a missing
    // arg falls back to a local dataset, which must be visible, not tacit
    System.err.println(s"[verify] sfDir=$sfDir outDir=$outDir (args=${args.mkString(",")})")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[2,8,3072] runs the whole gate
    // across REAL executor JVMs — the cheapest proof that every
    // TypedImperativeAggregate's serialize/merge/deserialize and every
    // broadcast survives a process boundary (local[n] keeps them all
    // in-process). Executors need the graft classes and the JDK17
    // module opens on their own command lines; the driver's sbt-side
    // settings don't propagate.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
    val builder =
      if (master.startsWith("local-cluster")) builder0
        .config("spark.executor.extraClassPath",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath)
        .config("spark.executor.extraJavaOptions",
          org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions())
      else builder0
    val spark = builder
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // reclaim reliable-checkpoint files (Caching.sealOver) when the
      // sealed result is GC'd — same setting as GraftSession
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CHECKPOINT_DIR routes every sealed operator through
    // the RELIABLE checkpoint branch (Caching.sealOver's cluster-mode
    // path) instead of localCheckpoint — the full query surface then
    // exercises the branch end to end, and the tail of the run asserts
    // the checkpoint FS is reclaimed (no rdd-* leak).
    val ckptDir = sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
    ckptDir.foreach(spark.sparkContext.setCheckpointDir)
    new java.io.File(outDir).mkdirs()
    // stale outputs from a previous run must not mask a now-broken query
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(): Unit
    }
    new java.io.File(outDir).listFiles()
      .filter(f => f.isDirectory || f.getName.endsWith(".parquet"))
      .foreach(rmTree)
    // dev loop: SPARK_GRAFT_ONLY=p08_temperature,t23_x runs a subset;
    // the driver never sets it, so the gate always sees the full map
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      // The driver's original stub wrote each result as a Spark parquet
      // DIRECTORY at outDir/<name> — that layout is what its DuckDB
      // compare looks for (all three earlier rounds scored {} once we
      // switched to flat files). Restore the stub layout exactly, and
      // ALSO keep a flat outDir/<name>.parquet copy of the part file so
      // single-file consumers (duckdb "f.parquet", scripts/check.py)
      // keep working.
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        val part = new java.io.File(s"$outDir/$name").listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file for $name"))
        Files.copy(part.toPath, Paths.get(s"$outDir/$name.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // manifest of EVERY declared query, so the checker can flag queries
    // that produced no output instead of silently skipping them
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      selected.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    ckptDir.foreach { root =>
      // every sealed result is unreachable now; drop cache/block refs,
      // then let GC + ContextCleaner (cleanCheckpoints=true) reclaim
      // the rdd-* dirs. Leaked dirs after the grace window = the seal
      // discipline regressed — fail loudly.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap { c =>
          (if (c.isDirectory) rddDirs(c) else Nil) ++
            (if (c.getName.startsWith("rdd-")) Seq(c) else Nil)
        }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var left = rddDirs(new java.io.File(root))
      while (left.nonEmpty && System.nanoTime() < deadline) {
        System.gc(); Thread.sleep(1000)
        left = rddDirs(new java.io.File(root))
      }
      System.err.println(
        s"[verify] reliable-checkpoint rdd dirs remaining after cleanup: ${left.size}")
      if (left.nonEmpty) throw new IllegalStateException(
        s"${left.size} rdd-* checkpoint dirs leaked under $root: " +
          left.take(3).mkString(", "))
    }
    spark.stop()
  }
}
