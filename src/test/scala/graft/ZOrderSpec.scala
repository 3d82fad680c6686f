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

  test("3-d z-order: a 3-d box prunes files a linear sort cannot") {
    // 16^3 uniform grid; the box constrains the SECOND and THIRD
    // dimensions, where a linear (a, b, c) sort has no stats to offer
    val n = 16
    val grid = (0 until n * n * n).map { i =>
      (i.toLong, (i / (n * n)).toDouble, ((i / n) % n).toDouble, (i % n).toDouble)
    }.toDF("id", "a", "b", "c")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder3").toString
    val numFiles = 16
    ZOrderLayout.writeZOrdered(grid, s"$dir/z", Seq("a", "b", "c"), numFiles, bits = 4)
    grid.repartitionByRange(numFiles, col("a"), col("b"), col("c"))
      .sortWithinPartitions("a", "b", "c")
      .write.mode("overwrite").parquet(s"$dir/linear")
    val zDf = spark.read.parquet(s"$dir/z")
    val lDf = spark.read.parquet(s"$dir/linear")
    val box = Seq(("a", 0.0, 15.0), ("b", 4.0, 7.0), ("c", 4.0, 7.0))
    val (zAdm, zTot) = ZOrderLayout.admittedFilesN(zDf, box)
    val (lAdm, lTot) = ZOrderLayout.admittedFilesN(lDf, box)
    info(s"3-d secondary box admits $zAdm/$zTot z-ordered files vs $lAdm/$lTot linear")
    assert(lAdm === lTot, "linear layout cannot prune b/c-only predicates")
    assert(zAdm < lAdm, s"3-d z-order must prune ($zAdm vs $lAdm)")
    assert(zAdm.toDouble / zTot <= 0.5)
    // round-trip: the layout is a reordering, never a row change
    assert(zDf.count() === grid.count())
  }

  test("sf0.1 events layout: z-order admits strictly fewer files than linear sort") {
    // the end-to-end pin behind the src_zorder_scan driver query: same
    // (ux, dy) dimensions, real data, file-level min-max evidence
    val dims = graft.SparkEntry.zorderScanDims(spark, SparkTestBase.Sf01)
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_sf01").toString
    val numFiles = 16
    ZOrderLayout.writeZOrdered(dims, s"$dir/z", "ux", "dy", numFiles, bits = 8)
    dims.repartitionByRange(numFiles, col("ux"), col("dy"))
      .sortWithinPartitions("ux", "dy")
      .write.mode("overwrite").parquet(s"$dir/linear")
    val zDf = spark.read.parquet(s"$dir/z")
    val lDf = spark.read.parquet(s"$dir/linear")
    // the src_zorder_scan box (ux 4-11, dy 18-25): both dims constrained —
    // z-order must not read more than half the files (a linear sort CAN
    // beat z here when the box is primary-dim-selective; the z win is that
    // it prunes whatever dimension the predicate lands on)
    val (zAdm, zTot) = ZOrderLayout.admittedFiles(zDf, "ux", "dy", 4, 11, 18, 25)
    val (lAdm, lTot) = ZOrderLayout.admittedFiles(lDf, "ux", "dy", 4, 11, 18, 25)
    info(s"sf0.1 events 2-d box admits $zAdm/$zTot z files vs $lAdm/$lTot linear")
    assert(zAdm.toDouble / zTot <= 0.5, s"$zAdm/$zTot")
    // THE strict pin: a predicate on the secondary dimension only — the
    // linear sort leads on ux, so every file spans the full dy range and
    // admits; z-order bounds dy per file and must admit strictly fewer
    val (zB, _) = ZOrderLayout.admittedFiles(zDf, "ux", "dy", 0, 255, 18, 25)
    val (lB, _) = ZOrderLayout.admittedFiles(lDf, "ux", "dy", 0, 255, 18, 25)
    info(s"sf0.1 events dy-slice admits $zB/$zTot z files vs $lB/$lTot linear")
    assert(lB === lTot, "linear layout cannot prune a secondary-dim predicate")
    assert(zB < lB, s"z-order must admit strictly fewer files ($zB vs $lB)")
    // a NARROW secondary slice (2 of ~30 days): pruning granularity at 16
    // files is 2 quantile bits per dim, so the wide 8-day slice above can
    // only shed ~half the quadrants (measured 9/16) while a slice inside
    // one dy-quadrant must drop to ~1/4 of the files
    val (zN, _) = ZOrderLayout.admittedFiles(zDf, "ux", "dy", 0, 255, 18, 19)
    info(s"sf0.1 events narrow dy-slice admits $zN/$zTot z files")
    assert(zN.toDouble / zTot <= 0.5, s"$zN/$zTot")
  }

  test("sf0.1 events 3-dim layout: the src_zorder_scan3 box prunes where linear cannot") {
    // the end-to-end pin behind the src_zorder_scan3 driver query: same
    // (ux, dy, hz) dims and box, real data, file-level min-max evidence
    val dims = graft.SparkEntry.zorderScanDims3(spark, SparkTestBase.Sf01)
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder3_sf01").toString
    val numFiles = 16
    ZOrderLayout.writeZOrdered(dims, s"$dir/z", Seq("ux", "dy", "hz"),
      numFiles, bits = 8)
    dims.repartitionByRange(numFiles, col("ux"), col("dy"), col("hz"))
      .sortWithinPartitions("ux", "dy", "hz")
      .write.mode("overwrite").parquet(s"$dir/linear")
    val zDf = spark.read.parquet(s"$dir/z")
    val lDf = spark.read.parquet(s"$dir/linear")
    // the driver query's 3-d box
    val box = Seq(("ux", 4.0, 11.0), ("dy", 18.0, 25.0), ("hz", 6.0, 17.0))
    val (zAdm, zTot) = ZOrderLayout.admittedFilesN(zDf, box)
    val (lAdm, lTot) = ZOrderLayout.admittedFilesN(lDf, box)
    info(s"sf0.1 events 3-d box admits $zAdm/$zTot z files vs $lAdm/$lTot linear")
    assert(zAdm.toDouble / zTot <= 0.5, s"$zAdm/$zTot")
    // the strict pin: constrain only the SECOND+THIRD dims — a linear
    // (ux, dy, hz) sort leads on ux, so every file spans the full dy/hz
    // ranges and admits; the 3-dim Morton key bounds all three per file
    val tail = Seq(("ux", 0.0, 255.0), ("dy", 18.0, 25.0), ("hz", 6.0, 17.0))
    val (zB, _) = ZOrderLayout.admittedFilesN(zDf, tail)
    val (lB, _) = ZOrderLayout.admittedFilesN(lDf, tail)
    info(s"sf0.1 events dy/hz-slice admits $zB/$zTot z files vs $lB/$lTot linear")
    assert(lB === lTot, "linear layout cannot prune secondary/tertiary-dim predicates")
    assert(zB < lB, s"3-dim z-order must admit strictly fewer files ($zB vs $lB)")
    // layout invariance: a reordering changes no rows
    assert(zDf.count() === dims.count())
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
