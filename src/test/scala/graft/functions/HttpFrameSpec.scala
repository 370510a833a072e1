package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTTP message framing (r18): the split between r43's WARC record
  * decode and t50's extraction. The body is EVERYTHING after the
  * first CRLFCRLF (verbatim — archives store final captured bytes);
  * header names match case-insensitively but only within the head;
  * a payload with no CRLFCRLF is NOT an HTTP message and every
  * extractor answers NULL, loudly.
  */
class HttpFrameSpec extends SparkSpec {
  import spark.implicits._

  private val msg = "HTTP/1.1 200 OK\r\n" +
    "content-TYPE: text/html; charset=utf-8\r\n" +
    "Content-Length: 11\r\n" +
    "Server: graft-crawler/1.0\r\n" +
    "\r\n" +
    "hello\r\nbody"

  private def one(m: String) = Seq(m).toDF("m")

  test("httpBody splits at the FIRST CRLFCRLF and keeps the rest verbatim") {
    val b = one(msg).select(TextFunctions.httpBody(col("m"))).head().getString(0)
    assert(b == "hello\r\nbody", s"'$b'")
    // a CRLFCRLF inside the body does not re-split
    val m2 = "HTTP/1.1 200 OK\r\n\r\nfirst\r\n\r\nsecond"
    val b2 = one(m2).select(TextFunctions.httpBody(col("m"))).head().getString(0)
    assert(b2 == "first\r\n\r\nsecond", s"'$b2'")
    // empty body is the empty string, not null
    val b3 = one("HTTP/1.1 204 No Content\r\n\r\n")
      .select(TextFunctions.httpBody(col("m"))).head().getString(0)
    assert(b3 == "")
  }

  test("httpStatus parses the status line; non-HTTP payloads are NULL") {
    val got = Seq(msg, "HTTP/1.0 404 Not Found\r\n\r\nx",
        "<html>not http</html>", "HTTP/1.1 weird\r\n\r\n")
      .toDF("m").select(TextFunctions.httpStatus(col("m")))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(got == Seq(200, 404, -1, -1), got.toString)
  }

  test("httpHeader is case-insensitive, head-only, NULL when absent") {
    val ct = one(msg)
      .select(TextFunctions.httpHeader(col("m"), "Content-Type"))
      .head().getString(0)
    assert(ct == "text/html; charset=utf-8", s"'$ct'")
    val cl = one(msg)
      .select(TextFunctions.httpHeader(col("m"), "content-length").cast("long"))
      .head().getLong(0)
    assert(cl == 11L)
    // a header-shaped line INSIDE the body must not leak out
    val sneaky = "HTTP/1.1 200 OK\r\n\r\nX-Evil: injected\r\n"
    val leak = one(sneaky)
      .select(TextFunctions.httpHeader(col("m"), "X-Evil"))
      .head()
    assert(leak.isNullAt(0), leak.toString)
    // absent header and non-HTTP payload are both NULL
    val noHead = one("no separator here")
      .select(TextFunctions.httpHeader(col("m"), "Server")).head()
    assert(noHead.isNullAt(0))
  }

  test("framing + extraction round-trips the r44 fixture shape") {
    // the exact fixture layout warcHtmlDir writes: declared
    // Content-Length equals the measured body bytes
    val html = "<html><body><p>a &amp; b</p></body></html>"
    val m = s"HTTP/1.1 301 Moved Permanently\r\nContent-Type: text/html; charset=utf-8\r\n" +
      s"Content-Length: ${html.getBytes("UTF-8").length}\r\nServer: graft-crawler/1.0\r\n\r\n" + html
    val row = one(m).select(
      TextFunctions.httpStatus(col("m")).as("s"),
      TextFunctions.httpHeader(col("m"), "Content-Length").cast("long").as("d"),
      octet_length(TextFunctions.httpBody(col("m"))).cast("long").as("b"),
      TextFunctions.htmlToText(TextFunctions.httpBody(col("m"))).as("t"))
      .head()
    assert(row.getInt(0) == 301)
    assert(row.getLong(1) == row.getLong(2), row.toString)
    assert(row.getString(3) == "a & b", s"'${row.getString(3)}'")
  }
}
