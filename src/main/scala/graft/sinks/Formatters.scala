package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Output formatters mirroring the reference's stdout sink
  * (sink/format.go): `table` (aligned ASCII table), `raw`
  * (comma-separated), `rawv` (MySQL \G-style, one field per line).
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

  /** Aligned ASCII table with +---+ borders (sink/format.go `table`). */
  def table(df: DataFrame): String = {
    val (names, rows) = cells(df)
    val widths = names.indices.map { i =>
      (names(i).length +: rows.map(_(i).length)).max
    }
    def line(sep: String, fill: String): String =
      widths.map(w => fill * (w + 2)).mkString(sep, sep, sep)
    def fmt(vals: Array[String]): String =
      vals.zip(widths).map { case (v, w) => " " + v.padTo(w, ' ') + " " }
        .mkString("|", "|", "|")
    val border = line("+", "-")
    (Seq(border, fmt(names), border) ++ rows.map(fmt) :+ border).mkString("\n")
  }

  /** Comma-separated values, one row per line (sink/format.go `raw`). */
  def raw(df: DataFrame): String = {
    val (_, rows) = cells(df)
    rows.map(_.mkString(",")).mkString("\n")
  }

  /** \G-style vertical output (sink/format.go `rawv`). */
  def rawv(df: DataFrame): String = {
    val (names, rows) = cells(df)
    val w = if (names.isEmpty) 0 else names.map(_.length).max
    rows.zipWithIndex.map { case (r, i) =>
      val head = s"*************************** ${i + 1}. row ***************************"
      val fields = names.zip(r).map { case (n, v) =>
        " " * (w - n.length) + n + ": " + v
      }
      (head +: fields).mkString("\n")
    }.mkString("\n")
  }

  def format(df: DataFrame, kind: String): String = kind match {
    case "table" => table(df)
    case "raw"   => raw(df)
    case "rawv"  => rawv(df)
    case other   => throw new IllegalArgumentException(
      s"unknown format '$other' (expected table|raw|rawv)")
  }
}
