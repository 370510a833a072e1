package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Silence-gap segmentation (m11): hand-computed islands on a
  * constructed energy profile, quiet-file and empty-blob edges.
  */
class SilenceSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def segs(text: String, chunkBytes: Int) =
    Multimodal.silenceSegments(
      Multimodal.withBlob(Seq((1L, text)).toDF("doc_id", "text"), "text"),
      "doc_id", "blob", chunkBytes)
      .orderBy("seg_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("loud-quiet-loud splits into two single-chunk segments") {
    // chunks of 4 bytes: 'z' = 122, '!' = 33
    // energies [488, 132, 488], mean 369.33 -> active iff e > 277
    val out = segs("zzzz!!!!zzzz", 4)
    assert(out.toSeq == Seq((1L, 0L, 0L, 1L), (2L, 2L, 2L, 1L)), out.mkString)
  }

  test("adjacent loud chunks fuse into one segment") {
    // energies [488, 488, 132] -> one 2-chunk segment
    val out = segs("zzzzzzzz!!!!", 4)
    assert(out.toSeq == Seq((1L, 0L, 1L, 2L)), out.mkString)
  }

  test("a flat file is never active; an empty blob yields no segments") {
    // equal energies: e*4*nc > 3*tot is true for every chunk when all
    // equal (4e*nc = 4tot > 3tot) -> the WHOLE file is one segment
    val flat = segs("aaaaaaaaaaaa", 4)
    assert(flat.toSeq == Seq((1L, 0L, 2L, 3L)), flat.mkString)
    assert(segs("", 4).isEmpty)
  }

  test("bad params fail loudly") {
    val df = Multimodal.withBlob(Seq((1L, "x")).toDF("doc_id", "text"), "text")
    intercept[IllegalArgumentException] {
      Multimodal.silenceSegments(df, "doc_id", "blob", 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.silenceSegments(df, "doc_id", "blob", 4, 1, 0)
    }
  }
}
