package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Audio clipping screen (m14): threshold edge on the real WAV
  * decode path, stub/real agreement on synth input, undecodable drop.
  */
class ClippingSpec extends SparkSpec {
  import spark.implicits._

  test("real decoder and stub agree on synth WAVs; threshold edge exact") {
    // byte 34 -> amp (34-128)*256 = -24064 (|.|>=24000: clipped);
    // byte 35 -> -23808 (not); byte 'a'=97 -> -7936 (not)
    val docs = Seq((1L, new String(Array[Byte](34, 35, 97, 97)))).toDF("doc_id", "text")
    val wavs = Multimodal.synthWav(docs, "doc_id", "text")
    val real = Multimodal.clippingStats(wavs, "id", "wav",
      frontend = Multimodal.WavAudio).collect().head
    assert(real.getLong(1) == 4L && real.getLong(2) == 1L
      && real.getLong(3) == 24064L, real.toString)
    // the stub sees the RAW wav bytes (header included), so drive it
    // on a bare payload: recentred bytes must match the synth rule
    val stub = Multimodal.clippingStats(
      Seq((1L, Array[Byte](34, 35, 97, 97))).toDF("id", "blob"),
      "id", "blob").collect().head
    assert(stub.getLong(2) == 1L && stub.getLong(3) == 24064L, stub.toString)
  }

  test("undecodable and empty streams drop; the rate flag is integer-exact") {
    val bad = Seq((1L, Array.fill[Byte](16)(0x42))).toDF("id", "wav")
    assert(Multimodal.clippingStats(bad, "id", "wav",
      frontend = Multimodal.WavAudio).count() == 0L)
    // 1 clipped of 5 samples = 20% > 18% -> flagged; 1 of 6 is not
    val five = Seq((1L, Array[Byte](0, 100, 100, 100, 100))).toDF("id", "blob")
    val six = Seq((1L, Array[Byte](0, 100, 100, 100, 100, 100))).toDF("id", "blob")
    assert(Multimodal.clippingStats(five, "id", "blob").collect().head.getBoolean(5))
    assert(!Multimodal.clippingStats(six, "id", "blob").collect().head.getBoolean(5))
  }
}
