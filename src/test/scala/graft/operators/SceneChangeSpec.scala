package graft.operators

import graft.SparkSpec

/** Scene-change detection (m08): a content shift between frames
  * fires exactly one boundary; identical adjacent frames are quiet;
  * single-frame videos emit nothing.
  */
class SceneChangeSpec extends SparkSpec {
  import spark.implicits._

  test("one boundary at the content shift, quiet elsewhere") {
    // 400-byte blob -> 4 frames of 100: aa | aa | zz | zz
    val blob = (("a" * 200) + ("z" * 200)).getBytes("UTF-8")
    val df = Seq((1L, blob)).toDF("doc_id", "blob")
    val out = Multimodal.sceneChanges(df, "doc_id", "blob", n = 4,
        tau2 = 1000L)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out(1L) == ((0L, false)), out)     // aa -> aa
    assert(out(3L) == ((0L, false)), out)     // zz -> zz
    val (d2, boundary) = out(2L)              // aa -> zz
    // per bin: ('z'-'a')*frame/8 bytes... exact: each of 8 bins sums
    // 12-13 bytes; diff = 25*12..13 per bin, squared and summed
    assert(boundary && d2 > 1000L, out(2L))
  }

  test("a single-frame blob emits no rows") {
    val df = Seq((1L, "ab".getBytes("UTF-8"))).toDF("doc_id", "blob")
    // 2 bytes -> min(4, 2) = 2 frames of 1 byte... use 1-byte blob
    val one = Seq((2L, "a".getBytes("UTF-8"))).toDF("doc_id", "blob")
    assert(Multimodal.sceneChanges(one, "doc_id", "blob", 4, 10L).count() == 0)
  }
}
