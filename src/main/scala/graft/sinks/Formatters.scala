package graft.sinks

import org.apache.spark.sql.DataFrame

/** Output formatters with BYTE parity to the reference's stdout sink
  * (sink/format.go): `table` renders the go-pretty default style the
  * reference's PTableFormatter uses — UPPERCASED headers, `+-|`
  * borders, one-space padding, left alignment, a border only after
  * the header, preceded by the `Run sql `...`:` line Print() emits —
  * and `raw`/`rawv` mirror RawPrintFormatter: horizontal mode prints
  * the column names joined by ", ", a 31-dash rule, ", "-joined rows
  * and a final blank line; vertical mode wraps each row's `col: val`
  * lines in 21-star rules. TailAppGoldenSpec pins these against
  * blocks derived from the reference README's own example output.
  *
  * NULLs render as the literal `NULL` in every mode — the reference's
  * table formatter does exactly that (format.go:66); its raw modes
  * scan into plain strings where a NULL's behavior is undefined (the
  * Scan error is ignored), so the table rule is adopted for all
  * three, documented here as the one deliberate divergence.
  *
  * These format a COLLECTED batch — they are sinks for window results
  * (small by construction), never for raw data. The distributed side
  * ends at the DataFrame; formatting is a driver-side presentation
  * concern, exactly as in the reference where the SQL result set is
  * already tiny.
  */
object Formatters {

  private def cells(df: DataFrame): (Array[String], Seq[Array[String]]) = {
    val names = df.columns
    val rows = df.collect().toSeq.map { r =>
      names.indices.map(i => if (r.isNullAt(i)) "NULL" else r.get(i).toString).toArray
    }
    (names, rows)
  }

  /** go-pretty default-style table (sink/format.go PTableFormatter),
    * with the `Run sql` prefix line when the SQL text is supplied.
    * Ends with a newline, as go-pretty's Render() does.
    */
  def table(df: DataFrame, sqlText: Option[String] = None): String = {
    val (names, rows) = cells(df)
    val heads = names.map(_.toUpperCase(java.util.Locale.ROOT))
    val widths = heads.indices.map { i =>
      (heads(i).length +: rows.map(_(i).length)).max
    }
    def border: String =
      widths.map(w => "-" * (w + 2)).mkString("+", "+", "+")
    def fmt(vals: Array[String]): String =
      vals.zip(widths).map { case (v, w) => " " + v.padTo(w, ' ') + " " }
        .mkString("|", "|", "|")
    val prefix = sqlText.map(s => s"Run sql `$s`:\n").getOrElse("")
    prefix +
      (Seq(border, fmt(heads), border) ++ rows.map(fmt) :+ border)
        .mkString("", "\n", "\n")
  }

  /** RawPrintFormatter horizontal mode: `c1, c2` header, a 31-dash
    * rule, `", "`-joined rows, final blank line. */
  def raw(df: DataFrame): String = {
    val (names, rows) = cells(df)
    val body =
      if (rows.isEmpty) ""
      else rows.map(_.mkString(", ")).mkString("", "\n", "\n")
    names.mkString(", ") + "\n" + ("-" * 31) + "\n" + body + "\n"
  }

  /** RawPrintFormatter vertical mode: each row's `col: val` lines
    * wrapped in 21-star rules, final blank line. */
  def rawv(df: DataFrame): String = {
    val (names, rows) = cells(df)
    val stars = "*" * 21
    rows.map { r =>
      stars + "\n" +
        names.zip(r).map { case (n, v) => s"$n: $v" }
          .mkString("", "\n", "\n") +
        stars + "\n"
    }.mkString + "\n"
  }

  def format(df: DataFrame, kind: String,
             sqlText: Option[String] = None): String = kind match {
    case "table" => table(df, sqlText)
    case "raw"   => raw(df)
    case "rawv"  => rawv(df)
    case other   => throw new IllegalArgumentException(
      s"unknown format '$other' (expected table|raw|rawv)")
  }
}
