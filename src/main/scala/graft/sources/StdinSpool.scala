package graft.sources

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.concurrent.atomic.AtomicReference

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
  *
  * Input is consumed character-at-a-time while `ready()` reports
  * buffered data, and buffered COMPLETE lines are published before
  * any read that may block — a writer that stalls mid-line cannot
  * hold already-complete lines hostage.
  */
object StdinSpool {

  /** Running spool: the copying thread plus its terminal state. The
    * thread records any failure instead of dying silently, so a
    * bounded run (`--once`) can distinguish "input drained" from
    * "input truncated by an I/O error" after [[join]].
    */
  final class Spool private[StdinSpool] (thread: Thread,
                                         err: AtomicReference[Throwable]) {
    def join(timeoutMs: Long = 0L): Unit = thread.join(timeoutMs)
    def isAlive: Boolean = thread.isAlive
    /** The failure that stopped the spool thread, if any. A closed
      * pipe (writer exits) is normal EOF, not a failure.
      */
    def failure: Option[Throwable] = Option(err.get())
    /** Join, then rethrow the spool thread's failure so a bounded run
      * fails loudly instead of processing a truncated spool.
      */
    def joinAndCheck(timeoutMs: Long = 0L): Unit = {
      join(timeoutMs)
      failure.foreach(t => throw new java.io.IOException(
        s"stdin/pipe spool failed after partial input: ${t.getMessage}", t))
    }
  }

  /** Start a daemon thread copying `in` to rolling files under `dir`.
    * The thread exits on EOF (or the pipe closing), flushing whatever
    * is buffered; any other failure (e.g. disk full in the spool dir)
    * is recorded on the returned handle. `join()`/`joinAndCheck()` it
    * to wait for a bounded input to drain — e.g. before an
    * AvailableNow run over the spool directory.
    */
  def spool(in: InputStream, dir: Path,
            maxLinesPerFile: Int = 1000): Spool = {
    Files.createDirectories(dir)
    val err = new AtomicReference[Throwable]()
    val t = new Thread(new Runnable {
      override def run(): Unit = {
        val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
        val buf = new scala.collection.mutable.ArrayBuffer[String]()
        val line = new StringBuilder
        var idx = 0
        def flush(): Unit = if (buf.nonEmpty) {
          val tmp = dir.resolve(f".spool-$idx%06d.tmp")
          Files.write(tmp, buf.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8))
          Files.move(tmp, dir.resolve(f"spool-$idx%06d.log"),
            StandardCopyOption.ATOMIC_MOVE)
          idx += 1
          buf.clear()
        }
        def endLine(): Unit = {
          buf += line.toString
          line.clear()
          if (buf.size >= maxLinesPerFile) flush()
        }
        // \n, \r and \r\n all terminate a line (readLine semantics);
        // after a bare \r, a following \n is part of the same break.
        var lastWasCR = false
        def accept(c: Int): Unit = {
          if (c == '\r') { endLine(); lastWasCR = true }
          else if (c == '\n') { if (!lastWasCR) endLine(); lastWasCR = false }
          else { line.append(c.toChar); lastWasCR = false }
        }
        // A closed pipe/stdin delivers EOF as read() == -1, never as
        // an exception — so a read-side IOException is a GENUINE
        // failure (EIO on flaky storage, stream torn down mid-read)
        // and is recorded on the handle like write-side failures,
        // instead of being mistaken for a clean drain.
        try {
          var eof = false
          while (!eof) {
            if (reader.ready()) {
              // buffered data: drain char-wise without blocking
              val c = reader.read()
              if (c < 0) eof = true else accept(c)
            } else {
              // idle: publish complete lines BEFORE a read that may
              // block (a stalled mid-line writer must not delay them)
              flush()
              val c = reader.read()
              if (c < 0) eof = true else accept(c)
            }
          }
        } catch {
          case t: Throwable => err.set(t)
        } finally {
          // a trailing unterminated line still counts (readLine parity)
          if (line.nonEmpty) buf += line.toString
          try flush()
          catch { case t: Throwable => err.compareAndSet(null, t); () }
        }
      }
    }, "graft-stdin-spool")
    t.setDaemon(true)
    t.start()
    new Spool(t, err)
  }
}
