package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** The genuinely-lossy JPEG arm (r17 verdict #6): the old fixture's JPEG
  * rows were constant-block constructions that round-trip pixel-exact —
  * hash-gateable, but silent about what lossy compression actually does
  * to the aHash. This fixture plants near-threshold cells whose means the
  * codec's DC rounding demonstrably flips (1-4 bits per pair, id-derived)
  * and a full-checkerboard texture the q0.75 high-frequency quantum
  * crushes (so the decode differs on ~all pixels — real information
  * loss). mm_lossy_jpeg_eval measures detection recall through the
  * PRODUCTION bucketed path; this spec pins the floor and the mechanism. */
class LossyJpegSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val media = Multimodal.syntheticImageVariantsLossy(spark, 100)
    .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

  test("the JPEG leg is genuinely lossy: decoded pixels differ from the base on most of the image") {
    for (id <- Seq(0L, 17L, 99L)) {
      val a = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(media(id)))
      val b = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(media(id + 1000L)))
      var diff = 0
      for (y <- 0 until 64; x <- 0 until 64)
        if ((a.getRGB(x, y) & 0xFF) != (b.getRGB(x, y) & 0xFF)) diff += 1
      assert(diff > 2048,
        s"id $id: only $diff/4096 pixels changed — not genuinely lossy")
    }
  }

  test("planted-pair grading: nonzero Hamming spread, recall floor at the production threshold, exhaustive one notch wider") {
    val hashed = Multimodal.imageHashes64(
      Multimodal.syntheticImageVariantsLossy(spark, 100))
    val row = Dedup.plantedPairEval(hashed, 1000L).head()
    val (nPlanted, nDetected) = (row.getLong(0), row.getLong(1))
    val recall = row.getDouble(2)
    val meanHam = row.getDouble(3)
    val maxHam = row.getLong(4)
    info(s"planted=$nPlanted detected=$nDetected recall=$recall " +
      s"meanHam=$meanHam maxHam=$maxHam")
    assert(nPlanted === 100L)
    // the measured claim Multimodal's docs used to assert: lossy wiggle
    // flips SOME near-threshold bits (never zero across 100 pairs) but
    // stays Hamming-close
    assert(meanHam > 0.0, "lossy JPEG flipped no bits — fixture degenerated " +
      "into the pixel-exact construction")
    assert(maxHam >= 3L && maxHam <= 8L,
      s"Hamming spread out of the near-dup regime: max=$maxHam")
    // recall floor at the production threshold (pairs past it are honest
    // misses — the cost of the tolerance boundary, measured)
    assert(recall >= 0.6, s"recall $recall below floor at maxHamming=3")
    assert(recall < 1.0,
      "every pair within the gate — the boundary is not being exercised")
    // one notch wider catches the whole spread: the planted distances are
    // near-dup distances, not noise
    val row4 = Dedup.plantedPairEval(hashed, 1000L, maxHamming = 4).head()
    assert(row4.getDouble(2) === 1.0,
      s"maxHamming=4 should be exhaustive, got recall ${row4.getDouble(2)}")
  }

  test("the flip count follows the planted construction per pair") {
    val hashed = Multimodal.imageHashes64(
        Multimodal.syntheticImageVariantsLossy(spark, 100))
      .select(col("id"), col("sim")).as[(Long, Long)].collect().toMap
    for (id <- 0L until 100L) {
      val ham = java.lang.Long.bitCount(hashed(id) ^ hashed(id + 1000L))
      val expect = 1 + (((id * 31L + 7L) % 4L) + 4L).toInt % 4
      assert(ham === expect,
        s"id $id: observed Hamming $ham != planted flip count $expect")
    }
  }
}
