package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorMath
import graft.sources.ZOrderLayout

/** Z-order layout: Morton-kernel unit vectors and the file-level pruning
  * evidence the layout exists for — a 2-d box predicate over the z-ordered
  * write must admit (on min-max stats alone, the same test a parquet
  * reader's row-group filter runs) strictly fewer files than the same box
  * over a linear single-column sort. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("Morton interleave: hand-computed vectors, clamping, bit placement") {
    // a=0b11 -> even positions, b=0b01 -> odd: z = 0b0111 = 7
    assert(VectorMath.zorder2(3L, 1L, 8) === 7L)
    assert(VectorMath.zorder2(1L, 3L, 8) === 11L) // 0b1011
    assert(VectorMath.zorder2(0L, 0L, 8) === 0L)
    // max 8-bit inputs fill 16 bits
    assert(VectorMath.zorder2(255L, 255L, 8) === 65535L)
    // clamp: only the low `bits` bits participate
    assert(VectorMath.zorder2(256L + 3L, 1L, 8) === VectorMath.zorder2(3L, 1L, 8))
    // locality: adjacent cells share high bits (same quadrant)
    assert((VectorMath.zorder2(100L, 100L, 8) >> 4) === (VectorMath.zorder2(101L, 101L, 8) >> 4))
  }

  test("z-ordered layout admits fewer files than a linear sort for a 2-d box") {
    // uniform 2-d grid: the adversarial-for-linear case (every A-slice
    // spans the full B range)
    val n = 64
    val grid = (0 until n * n).map(i => (i.toLong, (i / n).toDouble, (i % n).toDouble))
      .toDF("id", "a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val numFiles = 16
    ZOrderLayout.writeZOrdered(grid, s"$dir/z", "a", "b", numFiles, bits = 6)
    grid.repartitionByRange(numFiles, col("a"), col("b"))
      .sortWithinPartitions("a", "b")
      .write.mode("overwrite").parquet(s"$dir/linear")
    val zDf = spark.read.parquet(s"$dir/z")
    val lDf = spark.read.parquet(s"$dir/linear")
    // a centered box covering ~1/16 of each dimension's range
    val (lo, hi) = (24.0, 28.0)
    val (zAdm, zTot) = ZOrderLayout.admittedFiles(zDf, "a", "b", lo, hi, lo, hi)
    val (lAdm, lTot) = ZOrderLayout.admittedFiles(lDf, "a", "b", lo, hi, lo, hi)
    info(s"2-d box admits $zAdm/$zTot z-ordered files vs $lAdm/$lTot linear-sorted")
    assert(zTot >= numFiles - 1 && lTot >= numFiles - 1)
    assert(zAdm <= lAdm, s"z-order ($zAdm) must not lose to linear ($lAdm)")
    assert(zAdm.toDouble / zTot <= 0.34)
    // THE case the layout exists for: a predicate on the SECONDARY
    // dimension only. The linear sort leads on A, so every file spans the
    // full B range and stats prune nothing — a full scan. Z-order bounds
    // both dimensions per file: most files skip.
    val (zB, _) = ZOrderLayout.admittedFiles(zDf, "a", "b", 0.0, 63.0, lo, hi)
    val (lB, _) = ZOrderLayout.admittedFiles(lDf, "a", "b", 0.0, 63.0, lo, hi)
    info(s"secondary-dim slice admits $zB/$zTot z-ordered files vs $lB/$lTot linear-sorted")
    assert(lB === lTot, "linear layout cannot prune a secondary-dim predicate")
    assert(zB.toDouble / zTot <= 0.5,
      s"z-order must skip at least half the files on a secondary-dim slice ($zB/$zTot)")
  }

  test("quantile normalization keeps the key skew-robust") {
    // heavily skewed A (zipf-ish): equal-width bucketing would starve most
    // buckets; quantile cuts keep every z-cell populated, so the range
    // exchange stays balanced
    val rows = (1 to 4096).map { i =>
      (i.toLong, math.pow(i.toDouble, 3), (i % 64).toDouble)
    }.toDF("id", "a", "b")
    val key = ZOrderLayout.zKey(rows, "a", "b", bits = 4)
    val perBucket = rows.withColumn("z", key)
      .groupBy(expr("z >> 4")).count().select("count").as[Long].collect()
    // 16 A-quantile groups of a 4096-row table: each within 2x of uniform
    assert(perBucket.length === 16)
    assert(perBucket.min >= 128 && perBucket.max <= 512, perBucket.toSeq)
  }
}
