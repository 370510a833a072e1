package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** htmlToText (r17): script/style CONTENT must not leak (tag-strip
  * alone would), entities decode with &amp; last (the double-escape
  * rule), bare </> inside script code must not be mis-eaten as tags,
  * and malformed nesting degrades to tag-stripping — never an error.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h")
      .select(TextFunctions.htmlToText(col("h")).as("t"))
      .head().getString(0)

  test("script and style content is DROPPED, visible text survives") {
    val t = extract("<html><head><style>p { x: 1; }</style>" +
      "<script>var y = 1 < 2 && \"gone\";</script></head>" +
      "<body><p>keep me</p></body></html>")
    assert(t == "keep me", s"'$t'")
  }

  test("entities decode; &amp;lt; stays the literal text &lt;") {
    val t = extract("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;" +
      " x&nbsp;y &amp;lt;</p>")
    assert(t == "a & b <tag> \"q\" 's' x y &lt;", s"'$t'")
    // decoded '<' is literal text, never re-parsed as a tag
    assert(t.contains("<tag>"))
  }

  test("comments vanish; whitespace collapses; output is trimmed") {
    val t = extract("  <div>a<!-- hidden\nstuff -->b</div>\n\t<p> c \n d </p> ")
    assert(t == "a b c d", s"'$t'")
  }

  test("malformed nesting degrades to tag-stripping, not an error") {
    // crossed tags strip fine; an UNTERMINATED '<' at EOF keeps its
    // text (safer than eating everything to end-of-file)
    val t = extract("<p>start <b>bold <i>and</b> crossed</i> <unclosed end")
    assert(t == "start bold and crossed <unclosed end", s"'$t'")
  }
}
