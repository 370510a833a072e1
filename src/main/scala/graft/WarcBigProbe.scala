package graft

import org.apache.spark.sql.functions._

/** r18 verdict task 1 done-criterion: a single ≥512 MB .warc.gz
  * archive (the deployed Common Crawl file shape) must scan with
  * bounded task memory now that Warc.fileRows is a lazy per-record
  * iterator over an executor-side FS stream.
  *
  * The proof is two-sided:
  *   - the probe is meant to run with a SMALL heap
  *     (`SPARK_DRIVER_MEM=1g`): a reader that materializes the file
  *     array (~0.5 GB) plus the decoded rows (~0.5 GB) cannot
  *     complete there; the lazy reader must — an OOM is a loud FAIL,
  *     not a slow number;
  *   - a sampler thread records peak used heap across the scan, so
  *     the bound is a reported number (`peak_heap_mb`), not just
  *     survival.
  *
  * Usage: runMain graft.WarcBigProbe [archiveDir] [minGzMB]
  * Prints one JSON line; merge into BENCH_OPS10X_r18.json.
  */
object WarcBigProbe {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args.lift(0).getOrElse("/tmp/graft_bigwarc"))
    val minGzMB = args.lift(1).map(_.toInt).getOrElse(520)
    val f = new java.io.File(dir, "big.warc.gz")

    // build once, idempotent across runs: 1 MiB INCOMPRESSIBLE
    // payloads (seeded PRNG), each its own gzip member, until the
    // compressed file crosses the floor — random bytes keep gz size
    // ~= raw size, so ~minGzMB records of work
    if (!f.exists() || f.length() < minGzMB.toLong * 1024 * 1024) {
      dir.mkdirs()
      val out = new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f), 1 << 20)
      val rnd = new java.util.Random(42)
      val payload = new Array[Byte](1 << 20)
      var written = 0L
      var i = 0
      while (written < minGzMB.toLong * 1024 * 1024) {
        rnd.nextBytes(payload)
        val rec = sources.Warc.recordGz(s"http://big.example/doc/$i",
          "2024-01-01T00:00:00Z", s"<urn:big:$i>", payload,
          "application/octet-stream")
        out.write(rec)
        written += rec.length
        i += 1
      }
      out.close()
      System.err.println(s"[bigwarc] built $f: ${f.length()} bytes, $i records")
    }

    // few cores: the archive is ONE task by format; no need for 32
    val spark = GraftSession.get("4")
    spark.sparkContext.setLogLevel("WARN")

    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var sampling = true
    val sampler = new Thread(() => {
      val rt = Runtime.getRuntime
      while (sampling) {
        val used = rt.totalMemory() - rt.freeMemory()
        var cur = peak.get()
        while (used > cur && !peak.compareAndSet(cur, used)) cur = peak.get()
        Thread.sleep(20)
      }
    })
    System.gc(); Thread.sleep(200)
    val base = {
      val rt = Runtime.getRuntime; rt.totalMemory() - rt.freeMemory()
    }
    sampler.setDaemon(true); sampler.start()

    def scan(): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val r = sources.Warc.read(spark, dir.getAbsolutePath)
        .agg(count(lit(1)), sum(col("content_length")),
          count(when(col("warc_type") === "(corrupt)", 1)))
        .head()
      val dt = (System.nanoTime() - t0) / 1e9
      require(r.getLong(2) == 0L, "corrupt rows in the big archive scan")
      (r.getLong(0), r.getLong(1), dt)
    }
    val (n1, bytes1, warm) = scan()
    val (n2, bytes2, timed) = scan()
    require(n1 == n2 && bytes1 == bytes2, "non-deterministic scan")
    sampling = false
    val xmxMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val peakMb = peak.get() / (1024 * 1024)
    val baseMb = base / (1024 * 1024)
    val json =
      s"""{"probe":"warc_big_archive","gz_bytes":${f.length()},""" +
      s""""n_records":$n1,"payload_bytes":$bytes1,""" +
      f""""sec_warm":$warm%.2f,"sec":$timed%.2f,""" +
      s""""xmx_mb":$xmxMb,"baseline_heap_mb":$baseMb,"peak_heap_mb":$peakMb,""" +
      s""""note":"single ${f.length() / (1024 * 1024)} MB .warc.gz scanned as one task; """ +
      s"""ran under -Xmx${xmxMb}m - whole-archive materialization (~2x gz size) cannot fit there, lazy iteration must"}"""
    println(json)
    spark.stop()
  }
}
