package graft.sinks

import graft.SparkSpec

class FormattersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(("a", 1L), ("bb", 22L)).toDF("k", "n")

  test("table draws an aligned bordered grid") {
    val s = Formatters.table(df)
    val lines = s.split("\n")
    assert(lines.length == 6) // border, header, border, 2 rows, border
    assert(lines(0) == "+----+----+")
    assert(lines(1) == "| k  | n  |")
    assert(lines(4) == "| bb | 22 |")
    assert(lines.map(_.length).distinct.length == 1, "all lines same width")
  }

  test("raw emits comma-separated rows") {
    assert(Formatters.raw(df) == "a,1\nbb,22")
  }

  test("rawv emits \\G-style blocks") {
    val s = Formatters.rawv(df)
    assert(s.startsWith("*************************** 1. row"))
    assert(s.contains("k: a") && s.contains("n: 22"))
    assert(s.contains("*************************** 2. row"))
  }

  test("unknown format throws") {
    intercept[IllegalArgumentException](Formatters.format(df, "json"))
  }
}
