package graft

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.TailStream

/** CLI entry point with the reference app's surface: point it at a
  * directory of log files, give it a pattern and a SQL, get formatted
  * window results on stdout.
  *
  * {{{
  * runMain graft.TailApp --dir /var/log/app \
  *   --pattern '(?P<ts__date>\S+ \S+) (?P<level__str>\w+) (?P<ms__int>\d+)' \
  *   --window 60 [--slide 30] [--ts-field ts] [--filter "level='ERROR'"] \
  *   [--sql "SELECT ... FROM t0 ..."] [--format table|raw|rawv] \
  *   [--max-files-per-trigger 10] [--checkpoint /tmp/ckpt] [--once] \
  *   [--snapshot] [--seek-end]
  * }}}
  *
  * `--seek-end` = the reference's default tail behavior: skip files
  * already in the directory, read only ones modified after start.
  *
  * `--follow-file /var/log/app.log` (instead of `--dir`) follows ONE
  * growing file by byte offset — the reference's same-file `tail -f`
  * (source/fs.go Follow+ReOpen): appended lines stream in per trigger,
  * truncation/rotation reopens from the start, `--seek-end` starts at
  * the current EOF, and `--max-bytes-per-trigger N` bounds each batch.
  *
  * `--stdin` reads lines from standard input (`cat app.log | graft
  * --stdin --once ...`), `--pipe /run/app.fifo` from a named pipe —
  * both spool into a temp directory via [[graft.sources.StdinSpool]]
  * and tail that. With `--once`, stdin is drained to EOF before the
  * run, so the whole piped input is processed.
  *
  * `--snapshot` (needs `--ts-field`) switches from the incremental
  * per-batch preview to fire-once-per-complete-window semantics: the
  * SQL runs exactly once per window, over all of the window's rows,
  * when the watermark closes it.
  *
  * `--config app.conf` loads a java-properties config instead — the
  * analogue of the reference's YAML file (config/config.go), including
  * its N-source form. Sources become per-window views t0..tN
  * (TailStream.runMulti):
  * {{{
  * window.size_seconds=60
  * # window.slide_seconds=30   window.ts_field=ts   watermark=10 minutes
  * sql=SELECT t0.window_start, count(*) AS n FROM t0 GROUP BY 1 ORDER BY 1
  * format=table
  * source.0.dir=/var/log/app
  * source.0.pattern=(?P<ts__date>\\S+ \\S+) (?P<level__str>\\w+)
  * # source.0.filter=...  source.0.max_files_per_trigger=10
  * # source.0.do_not_tail=true            (default false = seek to end)
  * # source.0.follow=true                 (dir is ONE growing file)
  * # source.0.max_bytes_per_trigger=1048576
  * # source.0.throttle.max_elements_in_period=100
  * # source.0.throttle.period_seconds=10  (0/absent = unthrottled)
  * # source.1.dir=...     source.1.pattern=...
  * }}}
  * Explicit CLI flags (checkpoint, format, sql, trigger-sec, once,
  * snapshot) override the file's values; any other flag combined with
  * `--config` is rejected rather than silently ignored.
  *
  * A second tailed source (the reference's t1) joins per window on
  * `--join-keys`: `--dir2 /var/log/other --pattern2 '...' --join-keys
  * level` — right-side columns appear suffixed `_1` in the SQL view.
  */
object TailApp {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap // bare flags (--once, --snapshot) are read from the raw args

  private val Flags = Set("--once", "--snapshot", "--seek-end", "--stdin")

  /** Translate a properties config (see object doc) into the window
    * defaults + per-source configs. Pure, so the spec can pin the
    * translation without launching streams.
    */
  def fromProperties(p: java.util.Properties): Seq[TailStream.Config] = {
    def opt(k: String): Option[String] = Option(p.getProperty(k)).map(_.trim).filter(_.nonEmpty)
    val sourceIdxs = p.stringPropertyNames().toArray(Array.empty[String])
      .flatMap { k =>
        if (k.startsWith("source.")) k.split('.').lift(1).flatMap(_.toIntOption) else None
      }.distinct.sorted
    require(sourceIdxs.nonEmpty, "config needs at least source.0.dir / source.0.pattern")
    sourceIdxs.toSeq.map { i =>
      TailStream.Config(
        dir = opt(s"source.$i.dir").getOrElse(sys.error(s"source.$i.dir is required")),
        pattern = opt(s"source.$i.pattern").getOrElse(sys.error(s"source.$i.pattern is required")),
        filter = opt(s"source.$i.filter"),
        maxFilesPerTrigger = opt(s"source.$i.max_files_per_trigger").map(_.toInt),
        windowSizeSec = opt("window.size_seconds").map(_.toLong).getOrElse(60L),
        slideSec = opt("window.slide_seconds").map(_.toLong),
        tsField = opt("window.ts_field"),
        watermarkDelay = opt("watermark").getOrElse("10 minutes"),
        sql = opt("sql"),
        format = opt("format").getOrElse("table"),
        // reference config.yaml defaults: do_not_tail=false (seek to
        // end) and throttle 0 = unthrottled
        doNotTail = opt(s"source.$i.do_not_tail").exists(_.toBoolean),
        throttleMax = opt(s"source.$i.throttle.max_elements_in_period")
          .map(_.toInt).filter(_ > 0),
        throttlePeriodSec = opt(s"source.$i.throttle.period_seconds")
          .map(_.toLong).filter(_ > 0),
        // follow=true: dir is ONE growing file, tailed by byte offset
        follow = opt(s"source.$i.follow").exists(_.toBoolean),
        followMaxBytes = opt(s"source.$i.max_bytes_per_trigger")
          .map(_.toLong).filter(_ > 0))
    }
  }

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args.filterNot(Flags))
    val snapshot = args.contains("--snapshot")
    a.get("config").foreach { path =>
      // only these flags override the file; anything else would be
      // silently ignored — reject it instead of misleading the operator
      val overridable = Set("config", "sql", "format", "checkpoint", "trigger-sec")
      val unsupported = (a.keySet -- overridable).toSeq.sorted
      require(unsupported.isEmpty,
        s"--config supports only --sql/--format/--checkpoint/--trigger-sec" +
          s"/--once/--snapshot as overrides; set the rest in the file. " +
          s"Unsupported here: ${unsupported.map("--" + _).mkString(", ")}")
      // bare flags are stripped before parseArgs, so they need their own
      // check — --seek-end/--stdin with --config would otherwise be
      // silently ignored (seek behavior comes from each source's
      // do_not_tail; spooled input has no config-file form)
      val unsupportedBare = args.filter(Flags).filterNot(Set("--once", "--snapshot"))
      require(unsupportedBare.isEmpty,
        s"${unsupportedBare.mkString(", ")} cannot combine with --config; " +
          "set source.N.do_not_tail in the file instead of --seek-end")
      val props = new java.util.Properties()
      val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
      try props.load(in) finally in.close()
      val cfgs0 = fromProperties(props)
      // explicit CLI flags win over the file
      val cfgs = cfgs0.map(c => c.copy(
        sql = a.get("sql").orElse(c.sql),
        format = a.getOrElse("format", c.format)))
      val spark0 = GraftSession.get()
      val ckpt0 = a.getOrElse("checkpoint",
        java.nio.file.Files.createTempDirectory("graft-tailapp").toString)
      val trig =
        if (args.contains("--once")) Trigger.AvailableNow()
        else Trigger.ProcessingTime(a.getOrElse("trigger-sec", "5").toLong * 1000L)
      val head = cfgs.head
      val multiSql = head.sql.getOrElse(
        "SELECT window_start, count(*) AS n FROM t0 GROUP BY 1 ORDER BY 1")
      val q0 =
        if (cfgs.size == 1 && snapshot)
          TailStream.runSnapshot(spark0, head, ckpt0, trigger = trig)
        else if (cfgs.size == 1)
          TailStream.run(spark0, head, ckpt0, trigger = trig)
        else if (snapshot)
          TailStream.runMultiSnapshot(spark0, cfgs, multiSql,
            head.format, ckpt0, trigger = trig)
        else
          TailStream.runMulti(spark0, cfgs, multiSql,
            head.format, ckpt0, trigger = trig)
      q0.awaitTermination()
      spark0.stop()
      return
    }
    // --stdin / --pipe <fifo>: spool the push-style input into a temp
    // directory and tail THAT — the reference's stdin/namedpipe sources
    // (source/stdin.go, source/namedpipe.go). With --once the spool is
    // drained to EOF first so AvailableNow sees the complete input.
    val spooledDir: Option[String] =
      if (args.contains("--stdin") || a.contains("pipe")) {
        val d = java.nio.file.Files.createTempDirectory("graft-spool")
        val in: java.io.InputStream = a.get("pipe")
          .map(p => new java.io.FileInputStream(p): java.io.InputStream)
          .getOrElse(System.in)
        val th = graft.sources.StdinSpool.spool(in, d)
        // bounded run: drain to EOF and refuse to process a spool a
        // mid-stream I/O failure truncated
        if (args.contains("--once")) th.joinAndCheck()
        Some(d.toString)
      } else None
    val followFile = a.get("follow-file")
    val dir = spooledDir.orElse(followFile).getOrElse(
      a.getOrElse("dir", sys.error("--dir, --follow-file, --stdin or --pipe is required")))
    val pattern = a.getOrElse("pattern", sys.error("--pattern is required"))

    val cfg = TailStream.Config(
      dir = dir,
      pattern = pattern,
      follow = spooledDir.isEmpty && followFile.isDefined,
      followMaxBytes = a.get("max-bytes-per-trigger").map(_.toLong),
      filter = a.get("filter"),
      maxFilesPerTrigger = a.get("max-files-per-trigger").map(_.toInt),
      windowSizeSec = a.getOrElse("window", "60").toLong,
      slideSec = a.get("slide").map(_.toLong),
      tsField = a.get("ts-field"),
      watermarkDelay = a.getOrElse("watermark", "10 minutes"),
      sql = a.get("sql"),
      format = a.getOrElse("format", "table"),
      // CLI default processes what's in the dir (useful with --once);
      // --seek-end gives the reference's tail-from-now behavior
      doNotTail = !args.contains("--seek-end"))

    val spark = GraftSession.get()
    val ckpt = a.getOrElse("checkpoint",
      java.nio.file.Files.createTempDirectory("graft-tailapp").toString)
    val trigger =
      if (args.contains("--once")) Trigger.AvailableNow()
      else Trigger.ProcessingTime(a.getOrElse("trigger-sec", "5").toLong * 1000L)
    val q = a.get("dir2") match {
      case Some(dir2) =>
        val cfg2 = cfg.copy(dir = dir2,
          pattern = a.getOrElse("pattern2", pattern),
          filter = a.get("filter2"))
        val keys = a.get("join-keys").map(_.split(",").toSeq).getOrElse(Seq.empty)
        val sql = cfg.sql.getOrElse(
          "SELECT window_start, count(*) AS n FROM t0 GROUP BY 1 ORDER BY 1")
        if (snapshot)
          TailStream.runJoinSnapshot(spark, cfg, cfg2, keys, sql,
            cfg.format, ckpt, trigger = trigger)
        else
          TailStream.runJoin(spark, cfg, cfg2, keys, sql,
            cfg.format, ckpt, trigger = trigger)
      case None =>
        if (snapshot) TailStream.runSnapshot(spark, cfg, ckpt, trigger = trigger)
        else TailStream.run(spark, cfg, ckpt, trigger = trigger)
    }
    q.awaitTermination()
    spark.stop()
  }
}
