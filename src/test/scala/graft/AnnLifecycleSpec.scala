package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch
import graft.streaming.VectorIngest

/** Lifecycle of the growing vector index (r17 verdict #1/#4): compaction
  * (pure file rewrite of immutable codes — partition/file counts drop,
  * served bytes identical), tombstone deletion (retracted ids leave the
  * serve-time view without touching the immutable partitions; the next
  * compaction purges them physically), and index-health stats (the
  * re-seed signal: clamp saturation jumps when an out-of-range batch is
  * admitted under the frozen scales, imbalance jumps when a batch
  * collapses into one coarse cell). */
class AnnLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def key(df: DataFrame) = df
    .select(col("query_id"), col("vec_id"), round(col("cosine"), 9), col("rn"))
    .as[(Long, Long, Double, Int)].collect().sorted.toSeq

  private def emb = spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
  private def queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  test("flat-tier compaction: batch partitions merge, file count drops, served results byte-equal") {
    val tenth = pmod(col("vec_id"), lit(10))
    val base = java.nio.file.Files.createTempDirectory("graft_sq8_compact").toString
    try {
      VectorIngest.seedSq8(emb.filter(tenth < 6), s"$base/idx", s"$base/scales")
      // four small admissions -> four batch_id= dirs, the small-files shape
      // a per-micro-batch serve accumulates
      Seq(6, 7, 8, 9).zipWithIndex.foreach { case (t, b) =>
        VectorIngest.admitVectorBatch(spark, emb.filter(tenth === t), b.toLong,
          s"$base/idx", s"$base/scales")
      }
      val want = key(VectorIngest.knnIndexed(spark, s"$base/idx",
        s"$base/scales", queries, 5))
      assert(want.nonEmpty)
      val filesBefore = VectorIngest.dataFileCount(spark, s"$base/idx")
      assert(VectorIngest.admittedBatchIds(spark, s"$base/idx")
        === Seq(-1L, 0L, 1L, 2L, 3L))

      VectorIngest.compactBatches(spark, s"$base/idx", 0L, 3L)

      assert(VectorIngest.admittedBatchIds(spark, s"$base/idx") === Seq(-1L, 3L),
        "compaction must merge the covered range into batch_id=toBatch")
      val filesAfter = VectorIngest.dataFileCount(spark, s"$base/idx")
      assert(filesAfter < filesBefore,
        s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
      assert(key(VectorIngest.knnIndexed(spark, s"$base/idx", s"$base/scales",
        queries, 5)) === want,
        "compaction is a pure file rewrite — served results must be byte-equal")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("IVF-tier compaction: cell= layout survives, results byte-equal") {
    val tenth = pmod(col("vec_id"), lit(10))
    val base = java.nio.file.Files.createTempDirectory("graft_ivf_compact").toString
    try {
      VectorIngest.seedIvfSq8(emb.filter(tenth < 7),
        s"$base/idx", s"$base/scales", s"$base/cents")
      VectorIngest.admitVectorBatchIvf(spark, emb.filter(tenth.isin(7, 8)), 0L,
        s"$base/idx", s"$base/scales", s"$base/cents")
      VectorIngest.admitVectorBatchIvf(spark, emb.filter(tenth === 9), 1L,
        s"$base/idx", s"$base/scales", s"$base/cents")
      val want = key(VectorIngest.knnIndexedIvf(spark, s"$base/idx",
        s"$base/scales", s"$base/cents", queries, 5))
      assert(want.nonEmpty)
      val filesBefore = VectorIngest.dataFileCount(spark, s"$base/idx")

      VectorIngest.compactBatches(spark, s"$base/idx", 0L, 1L)

      assert(VectorIngest.admittedBatchIds(spark, s"$base/idx") === Seq(-1L, 1L))
      // the compacted partition is still hive-partitioned by cell — the
      // probe join's pruning unit survives the rewrite
      val cellDirs = new java.io.File(s"$base/idx/batch_id=1").listFiles()
        .filter(_.isDirectory).map(_.getName)
      assert(cellDirs.nonEmpty && cellDirs.forall(_.startsWith("cell=")),
        s"compacted batch lost the cell layout: ${cellDirs.mkString(",")}")
      assert(VectorIngest.dataFileCount(spark, s"$base/idx") < filesBefore)
      assert(key(VectorIngest.knnIndexedIvf(spark, s"$base/idx", s"$base/scales",
        s"$base/cents", queries, 5)) === want,
        "IVF compaction changed served results")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("tombstones: retracted ids leave the serve-time view; compaction purges them physically; frozen artifacts untouched") {
    val tenth = pmod(col("vec_id"), lit(10))
    val base = java.nio.file.Files.createTempDirectory("graft_sq8_tomb").toString
    try {
      val scales = VectorIngest.seedSq8(emb.filter(tenth < 7),
        s"$base/idx", s"$base/scales")
      VectorIngest.admitVectorBatch(spark, emb.filter(tenth.isin(7, 8)), 0L,
        s"$base/idx", s"$base/scales")
      VectorIngest.admitVectorBatch(spark, emb.filter(tenth === 9), 1L,
        s"$base/idx", s"$base/scales")
      val dead = emb.filter(pmod(col("vec_id"), lit(20)) === 9).select("vec_id")
      val deadIds = dead.as[Long].collect().toSet
      assert(deadIds.nonEmpty)

      // before deletion some retracted id must actually be serving (else
      // the test is vacuous)
      val before = VectorIngest.knnIndexed(spark, s"$base/idx",
        s"$base/scales", queries, 5)
      assert(before.filter(col("vec_id").isin(deadIds.toSeq: _*)).count() > 0,
        "fixture too weak: no tombstoned id was in any top-5")

      VectorIngest.addTombstones(spark, dead, s"$base/tomb")
      val served = VectorIngest.knnIndexed(spark, s"$base/idx",
        s"$base/scales", queries, 5, tombstonesDir = Some(s"$base/tomb"))
      assert(served.filter(col("vec_id").isin(deadIds.toSeq: _*)).count() === 0,
        "tombstoned ids must never serve")
      // parity: the tombstoned view == batch sq8Knn over the surviving
      // corpus under the SAME frozen scales (deletion re-derives nothing)
      val want = key(SimilaritySearch.sq8Knn(
        emb.filter(pmod(col("vec_id"), lit(20)) =!= 9), queries, 5,
        scales0 = Some(scales)))
      assert(key(served) === want,
        "tombstoned serve diverged from batch search over the survivors")

      // compaction with the tombstone frame purges physically
      VectorIngest.compactBatches(spark, s"$base/idx", 0L, 1L,
        tombstonesDir = Some(s"$base/tomb"))
      val inCompacted = spark.read.parquet(s"$base/idx/batch_id=1")
        .filter(col("vec_id").isin(deadIds.toSeq: _*)).count()
      assert(inCompacted === 0, "purged ids still on disk in the compacted range")
      // and the serve (still anti-joining for the uncompacted seed) agrees
      assert(key(VectorIngest.knnIndexed(spark, s"$base/idx", s"$base/scales",
        queries, 5, tombstonesDir = Some(s"$base/tomb"))) === want,
        "post-purge serve diverged")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("index stats: saturation jumps on an out-of-range batch; imbalance jumps on a cell-collapsed batch") {
    val tenth = pmod(col("vec_id"), lit(10))
    val base = java.nio.file.Files.createTempDirectory("graft_idx_stats").toString
    try {
      VectorIngest.seedIvfSq8(emb.filter(tenth < 7),
        s"$base/idx", s"$base/scales", s"$base/cents")
      // batch 0: in-range rows — the healthy admission
      VectorIngest.admitVectorBatchIvf(spark, emb.filter(tenth === 7), 0L,
        s"$base/idx", s"$base/scales", s"$base/cents")
      // batch 1: the SAME rows scaled x10 — every dimension stretched past
      // the frozen seed absmax, the saturation regime
      VectorIngest.admitVectorBatchIvf(spark,
        emb.filter(tenth === 8).select(col("vec_id"),
          transform(col("embedding"), x => x * lit(10.0f)).as("embedding")),
        1L, s"$base/idx", s"$base/scales", s"$base/cents")
      // batch 2: every row a copy of one seed vector — collapses into a
      // single coarse cell, the imbalance regime
      val anchor = emb.filter(tenth < 7).orderBy("vec_id")
        .select("embedding").head().getSeq[Float](0).toArray
      val anchorDf = emb.filter(tenth === 9).select(col("vec_id"),
        typedLit(anchor.toSeq).as("embedding"))
      VectorIngest.admitVectorBatchIvf(spark, anchorDf, 2L,
        s"$base/idx", s"$base/scales", s"$base/cents")

      val stats = VectorIngest.indexStats(spark, s"$base/idx",
          SimilaritySearch.DefaultNlist)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(3), r.getDouble(5))).toMap
      val (nSeed, imbSeed, satSeed) = stats(-1L)
      val (n0, _, sat0) = stats(0L)
      val (_, _, sat1) = stats(1L)
      val (_, imb2, _) = stats(2L)
      info(s"stats: seed=(n=$nSeed imb=$imbSeed sat=$satSeed) " +
        s"b0 sat=$sat0 b1 sat=$sat1 b2 imb=$imb2")
      assert(nSeed > 0 && n0 > 0)
      // the seed's own rate is the baseline (absmax rows sit at 127 by
      // construction); a healthy in-range batch stays in its vicinity,
      // the x10 batch saturates MOST of its slots
      assert(sat1 > 0.5, s"x10 batch should saturate most code slots, got $sat1")
      assert(sat1 > 10 * math.max(satSeed, 1e-6),
        s"saturation must JUMP on the out-of-range batch ($satSeed -> $sat1)")
      assert(sat0 < 0.1, s"in-range batch unexpectedly saturated: $sat0")
      // the collapsed batch concentrates in one cell: imbalance -> nlist
      assert(imb2 === SimilaritySearch.DefaultNlist.toDouble,
        s"single-cell batch must hit the max imbalance, got $imb2")
      assert(imbSeed < imb2, "seed imbalance should sit below the collapsed batch")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
