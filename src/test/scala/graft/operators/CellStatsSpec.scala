package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** Per-image cell stats (m13): the integer flat rule on both the
  * byte-fold oracle path and the REAL image decoder.
  */
class CellStatsSpec extends SparkSpec {
  import spark.implicits._

  private def png(fill: Int => Int): Array[Byte] = {
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = fill(x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("byte-fold path: constant blob is flat, varied blob is not") {
    val flat = Array.fill[Byte](640)(100)
    val varied = Array.tabulate[Byte](640)(i => (i % 251).toByte)
    val df = Seq((1L, flat), (2L, varied)).toDF("id", "blob")
    val rows = Multimodal.cellStats(df, "id", "blob")
      .orderBy("id").collect()
    // constant bytes: every cell sums 10*100 -> contrast 0, flat
    assert(rows(0).getLong(2) == 0L && rows(0).getBoolean(3))
    assert(rows(0).getDouble(1) == 1000.0)
    assert(!rows(1).getBoolean(3), rows(1).toString)
  }

  test("real decoder: a solid PNG is flat, a hard step image is not") {
    val solid = png(_ => 128)
    val step = png(x => if (x < 32) 0 else 255)
    val df = Seq((1L, solid), (2L, step)).toDF("id", "blob")
    val rows = Multimodal.cellStats(df, "id", "blob",
      decoder = Multimodal.ImageIoDecoder).orderBy("id").collect()
    assert(rows(0).getBoolean(3), s"solid image must be flat: ${rows(0)}")
    assert(!rows(1).getBoolean(3), s"step image must not be flat: ${rows(1)}")
    // undecodable bytes drop, never throw
    val bad = Seq((3L, Array.fill[Byte](32)(0x7f))).toDF("id", "blob")
    assert(Multimodal.cellStats(bad, "id", "blob",
      decoder = Multimodal.ImageIoDecoder).count() == 0L)
  }
}
