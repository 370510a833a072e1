package graft.sources

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** Spools an already-open byte stream — process stdin or a named pipe
  * (FIFO) — into a directory of rolling text files, turning the
  * reference's push-style inputs (source/stdin.go:20,
  * source/namedpipe.go:23) into exactly the shape the directory tail
  * source consumes. `cat app.log | graft --stdin` and
  * `--pipe /run/app.fifo` both come down to this.
  *
  * File-at-a-time publication is atomic: lines buffer into a
  * dot-prefixed temp file (hidden from Spark's directory listing),
  * which is renamed into place in one step once it holds
  * `maxLinesPerFile` lines or the stream goes idle. The streaming
  * reader therefore never sees a half-written file, and every line
  * enters exactly one spool file, in arrival order.
  */
object StdinSpool {

  /** Start a daemon thread copying `in` to rolling files under `dir`.
    * The thread exits on EOF (or the pipe closing), flushing whatever
    * is buffered. `join()` it to wait for a bounded input to drain —
    * e.g. before an AvailableNow run over the spool directory.
    */
  def spool(in: InputStream, dir: Path,
            maxLinesPerFile: Int = 1000): Thread = {
    Files.createDirectories(dir)
    val t = new Thread(new Runnable {
      override def run(): Unit = {
        val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
        val buf = new scala.collection.mutable.ArrayBuffer[String]()
        var idx = 0
        def flush(): Unit = if (buf.nonEmpty) {
          val tmp = dir.resolve(f".spool-$idx%06d.tmp")
          Files.write(tmp, buf.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8))
          Files.move(tmp, dir.resolve(f"spool-$idx%06d.log"),
            StandardCopyOption.ATOMIC_MOVE)
          idx += 1
          buf.clear()
        }
        try {
          var eof = false
          while (!eof) {
            if (reader.ready()) {
              // data buffered: drain it without publishing per line
              val line = reader.readLine()
              if (line == null) eof = true
              else {
                buf += line
                if (buf.size >= maxLinesPerFile) flush()
              }
            } else {
              // idle: publish what we have, then block for more input
              flush()
              val line = reader.readLine()
              if (line == null) eof = true else buf += line
            }
          }
        } catch {
          case _: java.io.IOException => () // writer side closed the pipe
        } finally flush()
      }
    }, "graft-stdin-spool")
    t.setDaemon(true)
    t.start()
    t
  }
}
