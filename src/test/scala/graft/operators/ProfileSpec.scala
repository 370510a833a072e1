package graft.operators

import graft.SparkSpec

/** DQ column profile (q48): the null/blank paths the zero-null
  * testdata can't exercise through the oracle.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("null, blank, and distinct counts per column") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), Some(" ")), (Some(2), Some("")),
      (None, Some("a")), (Some(3), None))
      .toDF("num", "txt")
    val got = Profile.columnProfile(df, Seq("num", "txt"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    // num: 5 rows, 1 null, no blanks, distinct {1,2,3}=3, rate 0.2
    assert(got("num") == ((5L, 1L, 0L, 3L, 0.2)), got("num").toString)
    // txt: 1 null; " " and "" both blank; distinct {a, " ", ""}=3
    assert(got("txt") == ((5L, 1L, 2L, 3L, 0.2)), got("txt").toString)
  }

  test("unknown columns fail loudly; metrics are cast-format independent") {
    val df = Seq((1.0e7, 1)).toDF("d", "i")
    intercept[IllegalArgumentException] {
      Profile.columnProfile(df, Seq("d", "nope"))
    }
    // a double that prints differently across engines ("1.0E7" vs
    // "10000000.0") still profiles identically: no emitted metric
    // depends on the string FORM
    val row = Profile.columnProfile(df, Seq("d")).collect().head
    assert((row.getLong(1), row.getLong(2), row.getLong(4)) == ((1L, 0L, 1L)))
  }
}
