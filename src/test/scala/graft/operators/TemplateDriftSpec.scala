package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Template drift (r25): new/vanished/shifted classification over the
  * earlier-vs-later halves of the time range, with finite add-1
  * ratios and top-k by |log ratio|.
  */
class TemplateDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")

  test("new, vanished, and shifted templates classify and rank correctly") {
    // range 00:00..00:40, boundary at 00:20
    val rows =
      (1 to 10).map(i => (ts(1), s"old only $i")) ++       // vanished
      (1 to 10).map(i => (ts(39), s"fresh crash $i")) ++   // new
      ((1 to 2).map(i => (ts(2), s"grows $i")) ++
        (1 to 18).map(i => (ts(38), s"grows $i"))) ++      // shifted up
      (1 to 5).map(i => (ts(3), s"steady $i")) ++
      (1 to 5).map(i => (ts(37), s"steady $i"))            // flat
    val df = rows.toDF("ts", "line")
    val out = LogMining.templateDrift(df, "ts", "line", k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))).toMap
    val (vb, va, vr, vs) = out("old only <N>")
    assert((vb, va, vs) == (10L, 0L, "vanished") && vr < 0, out("old only <N>"))
    val (nb, na, nr, ns) = out("fresh crash <N>")
    assert((nb, na, ns) == (0L, 10L, "new") && nr > 0, out("fresh crash <N>"))
    val (gb, ga, gr, gs) = out("grows <N>")
    assert((gb, ga, gs) == (2L, 18L, "shifted") && gr > 0, out("grows <N>"))
    val (sb, sa, sr, ss) = out("steady <N>")
    assert((sb, sa, sr, ss) == (5L, 5L, 0.0, "shifted"))
    // ranking: the 11x movers outrank the 6.3x grower outranks steady
    val ranked = LogMining.templateDrift(df, "ts", "line", k = 10)
      .collect().map(_.getString(0))
    assert(ranked.indexOf("grows <N>") >
      math.max(ranked.indexOf("old only <N>"), ranked.indexOf("fresh crash <N>")))
    assert(ranked.indexOf("steady <N>") == ranked.length - 1)
  }

  test("k truncates to the largest movers with a deterministic tie-break") {
    val rows =
      (1 to 3).map(i => (ts(1), s"aaa gone $i")) ++
      (1 to 3).map(i => (ts(39), s"bbb born $i")) ++
      Seq((ts(2), "ccc flat"), (ts(38), "ccc flat"))
    val out = LogMining.templateDrift(rows.toDF("ts", "line"), "ts", "line", k = 2)
      .collect().map(_.getString(0)).toSet
    // |ln(1/4)| == |ln(4)|: both movers beat the flat template
    assert(out == Set("aaa gone <N>", "bbb born <N>"), out)
  }
}
