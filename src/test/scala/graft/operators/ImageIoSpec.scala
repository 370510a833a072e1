package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** End-to-end real-image decode through the m01/m03/m05 swap point
  * (round-11 item #6): actual PNG/BMP payloads through
  * [[Multimodal.ImageIoDecoder]], with the byte-fold stub's behavior
  * (the oracle path) pinned unchanged alongside.
  */
class ImageIoSpec extends SparkSpec {
  import spark.implicits._

  /** A deterministic 64x48 left-dark/right-bright gradient, encoded
    * with the JDK's own writer — a REAL image, no fixtures on disk. */
  private def encode(fmt: String): Array[Byte] = {
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = x * 255 / 63
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("malformed payloads yield None, never a thrown task failure") {
    // crafted/corrupt image bytes can throw RuntimeExceptions from
    // deep inside the decoder (bad headers -> IllegalArgumentException,
    // CMMException, NegativeArraySizeException), not just IOException —
    // the contract is "undecodable bytes -> None -> drop the row".
    // A valid PNG signature followed by garbage forces the PNG reader
    // to actually engage (unlike pure garbage, which returns null).
    val pngSig = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val candidates = Seq(
      pngSig ++ Array.fill[Byte](64)(0x41),
      pngSig ++ encode("png").drop(8).take(40),           // truncated mid-chunk
      Array.fill[Byte](128)(0x7f),                        // no signature at all
      encode("bmp").take(20))                             // truncated BMP header
    for (bad <- candidates) {
      assert(Multimodal.ImageIoDecoder.cells(bad, 64).isEmpty)
      assert(Multimodal.ImageIoDecoder.resize(bad, 8, 8).isEmpty)
      assert(Multimodal.ImageIoDecoder.features(bad, 4).isEmpty)
    }
  }

  test("imagePhash on real images is perceptual: PNG and BMP of the same pixels agree") {
    val png = encode("png")
    val bmp = encode("bmp")
    assert(!java.util.Arrays.equals(png, bmp), "encodings should differ at byte level")
    val df = Seq((1L, png), (2L, bmp), (3L, "not an image".getBytes("UTF-8")))
      .toDF("id", "blob")
    val real = Multimodal.imagePhash(df, "id", "blob",
        decoder = Multimodal.ImageIoDecoder)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    // undecodable bytes drop (no fingerprint, not a fake one)
    assert(real.keySet == Set(1L, 2L))
    // same pixels, different bytes -> SAME perceptual hash
    assert(real(1L) == real(2L), s"png=${real(1L)} bmp=${real(2L)}")
    // the byte-fold stub, fed the same blobs, sees bytes not pixels:
    // different encodings hash apart — and id 3 still fingerprints,
    // because the stub makes no decodability claim (oracle parity)
    val stub = Multimodal.imagePhash(df, "id", "blob")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(stub.keySet == Set(1L, 2L, 3L))
    assert(stub(1L) != stub(2L), "stub hashing bytes should differ across encodings")
  }

  test("the hash is robust: a brightness-shifted copy stays near, noise stays far") {
    // dHash compares neighboring cell means, so a global +25 brightness
    // shift preserves most gradient signs (near-dup at small hamming),
    // while an unrelated checkerboard lands far — the property that
    // makes phash-bucketed image dedup (m05) work on re-encodes and
    // mild edits, not just byte-identical files
    def img(f: (Int, Int) => Int): Array[Byte] = {
      val b = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val v = math.max(0, math.min(255, f(x, y)))
        b.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(b, "png", bos)
      bos.toByteArray
    }
    val base = img((x, _) => x * 255 / 63)
    val brighter = img((x, _) => x * 255 / 63 + 25)
    val unrelated = img((x, y) => if ((x / 8 + y / 8) % 2 == 0) 0 else 255)
    val df = Seq((1L, base), (2L, brighter), (3L, unrelated)).toDF("id", "blob")
    val h = Multimodal.imagePhash(df, "id", "blob",
        decoder = Multimodal.ImageIoDecoder)
      .collect().map(r => r.getLong(0) ->
        Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    def ham(a: Seq[Int], b: Seq[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val near = ham(h(1L), h(2L))
    val far = ham(h(1L), h(3L))
    info(s"near=$near far=$far (of 64)")
    assert(near <= 8, s"brightness shift moved the hash too much: $near")
    assert(far >= 16, s"unrelated image landed too close: $far")
  }

  test("resize decodes, scales, and re-encodes a real PNG to the target dims") {
    val df = Seq((1L, encode("png")), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "blob")
    val out = Multimodal.resizeStub(df, "id", "blob", w = 16, h = 12,
      decoder = Multimodal.ImageIoDecoder).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L), "undecodable row must drop")
    val r = out.head
    val resized = ImageIO.read(
      new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("resized")))
    assert(resized.getWidth == 16 && resized.getHeight == 12)
    // the gradient survives the scale: left edge darker than right
    assert((resized.getRGB(0, 6) & 0xff) < (resized.getRGB(15, 6) & 0xff))
  }

  test("decodeFeatures on a real image folds luminances, not file bytes") {
    val df = Seq((1L, encode("png")), (2L, encode("bmp"))).toDF("id", "blob")
    val feats = Multimodal.decodeFeatures(df, "id", "blob", dim = 8,
        decoder = Multimodal.ImageIoDecoder)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3), r.getSeq[Double](4)))).toMap
    // pixel-domain: both encodings yield identical stats
    assert(feats(1L) == feats(2L))
    val (n, mean, _) = feats(1L)
    assert(n == 64L * 48L, s"n_bytes should be the pixel count, got $n")
    // gradient 0..255 mean ~127.5 in the luminance plane
    assert(mean > 100 && mean < 155, s"mean=$mean")
  }
}
