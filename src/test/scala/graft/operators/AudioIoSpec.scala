package graft.operators

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpec

/** End-to-end real-audio decode through the m04/m11 swap point
  * (round-14 item #2, the ImageIoSpec treatment for audio): actual
  * WAV payloads through [[Multimodal.WavAudio]], with the byte-fold
  * stub's behavior (the oracle path) pinned unchanged alongside.
  */
class AudioIoSpec extends SparkSpec {
  import spark.implicits._

  /** A REAL RIFF/WAVE file from raw samples via the JDK's own writer —
    * no fixtures on disk. 16-bit signed PCM, `ch` interleaved channels
    * (every channel carries the same waveform), selectable endianness.
    */
  private def wav16(samples: Array[Int], ch: Int = 1): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, ch, ch * 2, 8000f, false)
    val raw = new Array[Byte](samples.length * ch * 2)
    for (f <- samples.indices; c <- 0 until ch) {
      val i = (f * ch + c) * 2
      val s = samples(f)
      raw(i) = s.toByte; raw(i + 1) = (s >> 8).toByte
    }
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 1600 frames: 800 of digital silence, then 800 of a ±0x4000
    * square — the half-silent recording every VAD test wants. */
  private def halfSilent: Array[Int] =
    Array.tabulate(1600)(i =>
      if (i < 800) 0 else if (i % 2 == 0) 0x4000 else -0x4000)

  test("malformed payloads yield None, never a thrown task failure") {
    val good = wav16(halfSilent)
    val candidates = Seq(
      "not audio at all".getBytes("UTF-8"),
      good.take(16),                       // truncated inside the RIFF header
      "RIFF".getBytes("UTF-8") ++ Array.fill[Byte](40)(0x41), // RIFF then garbage
      Array.empty[Byte])
    for (bad <- candidates)
      assert(Multimodal.WavAudio.chunks(bad, 200).isEmpty,
        s"expected None for ${bad.length}-byte payload")
    assert(Multimodal.WavAudio.chunks(null, 200).isEmpty)
  }

  test("silenceSegments on a real WAV cuts at the acoustic boundary") {
    val df = Seq((1L, wav16(halfSilent)),
      (2L, "not audio".getBytes("UTF-8"))).toDF("id", "blob")
    // 200-frame chunks -> 8 chunks; 0-3 silent, 4-7 active: ONE
    // segment spanning exactly the loud half. The undecodable row
    // drops (no evidence), it does not fake a segmentation.
    val segs = Multimodal.silenceSegments(df, "id", "blob",
        chunkBytes = 200, frontend = Multimodal.WavAudio)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("start_chunk"), r.getAs[Long]("end_chunk"),
        r.getAs[Long]("n_chunks")))
    // chunks 4..7 all carry energy 200*0x4000, far above the
    // 3/4-of-mean threshold -> exactly one 4-chunk segment
    assert(segs.toSeq == Seq((1L, 1L, 4L, 7L, 4L)), s"got ${segs.toSeq}")
  }

  test("chunkAudio on a real WAV reports frame-grain offsets and amplitude means") {
    val df = Seq((1L, wav16(halfSilent))).toDF("id", "blob")
    val rows = Multimodal.chunkAudio(df, "id", "blob", chunkBytes = 200,
        frontend = Multimodal.WavAudio)
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length == 8)
    // offsets count FRAMES (the real-audio unit), not file bytes
    assert(rows.map(_._2).toSeq == (0 until 8).map(_ * 200L))
    assert(rows.forall(_._3 == 200L))
    // silent chunks mean 0; square chunks mean |±0x4000| = 16384
    assert(rows.take(4).forall(_._4 == 0.0), s"silent half: ${rows.take(4).toSeq}")
    assert(rows.drop(4).forall(_._4 == 16384.0), s"loud half: ${rows.drop(4).toSeq}")
  }

  test("decode is acoustic, not byte-cosmetic: containers of the same waveform agree") {
    // (endianness is no container test: the WAVE writer normalizes
    // big-endian input to the spec's little-endian on write, so the
    // files come out byte-identical — channel layout is the real
    // same-waveform-different-bytes axis available in-container)
    val mono = wav16(halfSilent)
    val stereo = wav16(halfSilent, ch = 2) // same waveform, both channels
    assert(!java.util.Arrays.equals(mono, stereo))
    val Seq(cm, cs) = Seq(mono, stereo).map(b =>
      Multimodal.WavAudio.chunks(b, 200).get.toSeq)
    assert(cm == cs, "stereo duplication must decode to the mono chunks")
    // the byte-fold stub, fed the same blobs, sees container bytes:
    // the encodings chunk apart — and the garbage blob still chunks,
    // because the stub makes no decodability claim (oracle parity)
    val sm = Multimodal.ByteFoldAudio.chunks(mono, 200).get.toSeq
    val ss = Multimodal.ByteFoldAudio.chunks(stereo, 200).get.toSeq
    assert(sm != ss, "stub folding bytes should differ across containers")
    assert(Multimodal.ByteFoldAudio.chunks(
      "not audio".getBytes("UTF-8"), 4).nonEmpty)
  }

  test("synthWav round-trips: decode recovers the exact recentred text bytes") {
    // the m12 contract: sample f of the synthesized WAV decodes to
    // ((byte f) - 128) << 8 EXACTLY — if the header, endianness, or
    // the decoder's conversion moved one sample, the m12 oracle (which
    // recomputes energies from the text, never the WAV) would break
    val text = "Graft über alles: ±16-bit"
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val wav = Multimodal.synthWav(df, "doc_id", "text")
      .collect().head.getAs[Array[Byte]]("wav")
    val bytes = text.getBytes("UTF-8")
    assert(wav.length == 44 + 2 * bytes.length)
    // the JDK parses our hand-built header as 16-bit mono PCM
    val chunks = Multimodal.WavAudio.chunks(wav, bytes.length).get
    assert(chunks.length == 1 && chunks.head.n == bytes.length.toLong)
    val wantEnergy = bytes.map(b => math.abs((b & 0xff) - 128).toLong * 256L).sum
    assert(chunks.head.energy == wantEnergy,
      s"decoded energy ${chunks.head.energy} != $wantEnergy from text bytes")
    // null text drops, empty text still synthesizes a (silent) file
    val edge = Seq((1L, ""), (2L, null: String)).toDF("doc_id", "text")
    val got = Multimodal.synthWav(edge, "doc_id", "text").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.head.getAs[Array[Byte]]("wav").length == 44)
  }

  test("the stub path is byte-for-byte the m04/m11 oracle fold (no drift from the refactor)") {
    // the frontend extraction must not move the oracle: per-chunk
    // (offset, n, mean, energy) over raw bytes computed independently
    val bytes = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val got = Multimodal.ByteFoldAudio.chunks(bytes, 10).get
    val want = bytes.grouped(10).toArray.zipWithIndex.map { case (g, i) =>
      val s = g.map(b => (b & 0xff).toLong).sum
      Multimodal.AudioChunk(i * 10L, g.length.toLong, s.toDouble / g.length, s)
    }
    assert(got.toSeq == want.toSeq)
    // empty blob: ONE zero-byte chunk (the m04 max(1, ...) contract)
    assert(Multimodal.ByteFoldAudio.chunks(Array.empty[Byte], 10).get.toSeq ==
      Seq(Multimodal.AudioChunk(0L, 0L, 0.0, 0L)))
  }
}
