package graft.sinks

import graft.SparkSpec

class FormattersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(("a", 1L), ("bb", 22L)).toDF("k", "n")

  test("table draws the go-pretty grid: uppercase headers, border after header only") {
    val s = Formatters.table(df)
    val lines = s.split("\n")
    assert(lines.length == 6) // border, header, border, 2 rows, border
    assert(lines(0) == "+----+----+")
    assert(lines(1) == "| K  | N  |")
    assert(lines(4) == "| bb | 22 |")
    assert(s.endsWith("+\n"))
    assert(lines.map(_.length).distinct.length == 1, "all lines same width")
  }

  test("table prepends the reference's Run sql line when given the text") {
    val s = Formatters.table(df, Some("select 1"))
    assert(s.startsWith("Run sql `select 1`:\n+"))
  }

  test("raw emits the header, the 31-dash rule, ', '-joined rows, blank line") {
    assert(Formatters.raw(df) ==
      "k, n\n" + ("-" * 31) + "\na, 1\nbb, 22\n\n")
  }

  test("rawv wraps each row's col: val lines in 21-star rules") {
    val stars = "*" * 21
    assert(Formatters.rawv(df) ==
      s"$stars\nk: a\nn: 1\n$stars\n$stars\nk: bb\nn: 22\n$stars\n\n")
  }

  test("NULL renders as the literal NULL in every mode") {
    val n = Seq((Some("x"), None: Option[java.lang.Long])).toDF("k", "n")
    assert(Formatters.raw(n).contains("x, NULL"))
    assert(Formatters.rawv(n).contains("n: NULL"))
    assert(Formatters.table(n).contains("| NULL |"))
  }

  test("unknown format throws") {
    intercept[IllegalArgumentException](Formatters.format(df, "json"))
  }
}
