package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Audio segment overlap (m07): content-keyed block matching finds a
  * shared segment at any block-aligned offset, repeated chunks don't
  * inflate counts, and misaligned shifts are (documentedly) missed.
  */
class AudioOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def blob(s: String) = s.getBytes("UTF-8")
  private val A = "A" * 100
  private val B = "B" * 100
  private val C = "C" * 100
  private val D = "D" * 100

  test("a shared segment is found at a DIFFERENT block-aligned offset") {
    val df = Seq(
      (1L, blob(A + B + C)),  // segment B at block 1
      (2L, blob(D + D + B))   // segment B at block 2
    ).toDF("doc_id", "blob")
    val out = Multimodal.audioChunkOverlap(df, "doc_id", "blob", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L)), out.mkString(","))
  }

  test("repeated silence counts once per pair, not quadratically") {
    val df = Seq(
      (1L, blob(A + A + A + B)),  // A three times
      (2L, blob(A + A + C))       // A twice
    ).toDF("doc_id", "blob")
    val out = Multimodal.audioChunkOverlap(df, "doc_id", "blob", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // shared DISTINCT contents: {A} -> 1, never 3x2=6
    assert(out.toSeq == Seq((1L, 2L, 1L)), out.mkString(","))
  }

  test("a non-block-aligned shift is missed — the documented limit") {
    val df = Seq(
      (1L, blob(A + B)),
      (2L, blob("x" + A + B))  // shifted by 1 byte
    ).toDF("doc_id", "blob")
    val out = Multimodal.audioChunkOverlap(df, "doc_id", "blob", 100).collect()
    assert(out.isEmpty, out.mkString(","))
  }

  test("empty blobs and null ids drop; identical files share all chunks") {
    val df = Seq(
      (Some(1L), blob(A + B)),
      (Some(2L), blob(A + B)),
      (Some(3L), Array.empty[Byte]),
      (None, blob(A + B))
    ).toDF("doc_id", "blob")
    val out = Multimodal.audioChunkOverlap(df, "doc_id", "blob", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 2L)), out.mkString(","))
  }
}
