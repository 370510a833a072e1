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
  *   [--snapshot]
  * }}}
  *
  * `--snapshot` (needs `--ts-field`) switches from the incremental
  * per-batch preview to fire-once-per-complete-window semantics: the
  * SQL runs exactly once per window, over all of the window's rows,
  * when the watermark closes it.
  *
  * A second tailed source (the reference's t1) joins per window on
  * `--join-keys`: `--dir2 /var/log/other --pattern2 '...' --join-keys
  * level` — right-side columns appear suffixed `_1` in the SQL view.
  */
object TailApp {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap ++ (if (args.contains("--once")) Map("once" -> "true") else Map.empty)

  private val Flags = Set("--once", "--snapshot")

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args.filterNot(Flags))
    val snapshot = args.contains("--snapshot")
    val dir = a.getOrElse("dir", sys.error("--dir is required"))
    val pattern = a.getOrElse("pattern", sys.error("--pattern is required"))

    val cfg = TailStream.Config(
      dir = dir,
      pattern = pattern,
      filter = a.get("filter"),
      maxFilesPerTrigger = a.get("max-files-per-trigger").map(_.toInt),
      windowSizeSec = a.getOrElse("window", "60").toLong,
      slideSec = a.get("slide").map(_.toLong),
      tsField = a.get("ts-field"),
      watermarkDelay = a.getOrElse("watermark", "10 minutes"),
      sql = a.get("sql"),
      format = a.getOrElse("format", "table"))

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
