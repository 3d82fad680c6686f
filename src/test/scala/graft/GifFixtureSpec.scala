package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the directly-emitted GIF fixture bytes (r20 optimization):
  * `SyntheticMedia.gifNoise` now writes the GIF89a container itself
  * instead of driving the ImageIO sequence writer (~80 us/frame of
  * metadata/palette/LZW plumbing for a uniform 8x8 frame). The DECODE
  * path — the thing the mm_* operators test — stays the real ImageIO GIF
  * reader, so this spec proves the emitted bytes are (a) decodable by
  * that reader, (b) raster-identical to the ImageIO-writer construction,
  * and (c) hash-equivalent under the re-timing invariance the fixture
  * exists to plant. */
class GifFixtureSpec extends AnyFunSuite {
  import graft.operators.Multimodal

  private def frames(payload: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis, false, true)
    val n = reader.getNumImages(true)
    val out = (0 until n).map(reader.read)
    reader.dispose(); iis.close()
    out
  }

  /** The pre-r20 construction: the same uniform frames through the ImageIO
    * GIF sequence writer — the golden reference for raster equality. */
  private def gifNoiseViaImageIO(id: Long, repl: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- 0 until 64) {
        val b = id * 257L + f * 193L + 7L
        val v = ((b * b) % 256).toInt
        val img = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 8; x <- 0 until 8)
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        for (_ <- 0 until repl)
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  test("hand-emitted GIF decodes frame-for-frame, pixel-for-pixel like the ImageIO-written one") {
    for (id <- Seq(0L, 7L, 99L); repl <- Seq(1, 2)) {
      val fast = frames(Multimodal.SyntheticMedia.gifNoise(id, repl))
      val ref = frames(gifNoiseViaImageIO(id, repl))
      assert(fast.size === 64 * repl, s"frame count id=$id repl=$repl")
      assert(fast.size === ref.size)
      for (f <- fast.indices) {
        val b = id * 257L + (f / repl) * 193L + 7L
        val v = ((b * b) % 256).toInt
        val expected = 0xFF000000 | (v << 16) | (v << 8) | v
        for (y <- 0 until 8; x <- 0 until 8) {
          assert(fast(f).getRGB(x, y) === expected,
            s"pixel drift id=$id repl=$repl frame=$f ($x,$y)")
          assert(fast(f).getRGB(x, y) === ref(f).getRGB(x, y))
        }
      }
    }
  }

  test("videoTHash64 of the hand-emitted clip equals its frame-doubled variant (the planted invariance)") {
    for (id <- Seq(3L, 42L)) {
      val h1 = Multimodal.MediaDecoder.videoTHash64(
        Multimodal.SyntheticMedia.gifNoise(id, 1))
      val h2 = Multimodal.MediaDecoder.videoTHash64(
        Multimodal.SyntheticMedia.gifNoise(id, 2))
      assert(h1.isDefined && h1 === h2, s"re-timing invariance broke for id=$id")
    }
  }
}
