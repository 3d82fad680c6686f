package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.CorpusIngest

/** Streaming ingest-dedup == batch ingest-dedup: micro-batch boundaries must
  * not change admission decisions, because each document's verdict depends
  * only on (document, corpus). */
class CorpusIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streamed batches' union equals one batch-mode incremental dedup") {
    val docs = spark.read.parquet(s"${SparkTestBase.Sf0001}/documents.parquet")
      .select("doc_id", "text")
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    assert(incoming.count() > 0)

    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    try {
      // several source files -> maxFilesPerTrigger=1 forces >1 micro-batch
      incoming.repartition(4).write.parquet(s"$base/src")
      CorpusIngest.ingestDedupStreaming(spark, s"$base/src", corpus,
        "text", "doc_id", s"$base/out", s"$base/ckpt", jaccardThreshold = 0.5)

      val streamed = spark.read.parquet(s"$base/out")
      assert(streamed.select("batch_id").distinct().count() > 1,
        "expected multiple micro-batches")
      val batchMode = Dedup.incrementalDedup(corpus, incoming, "text", "doc_id",
        jaccardThreshold = 0.5)
      val got = streamed.select("id", "dup_of", "jaccard", "is_new")
        .as[(Long, Option[Long], Option[Double], Boolean)].collect().toSet
      val want = batchMode
        .as[(Long, Option[Long], Option[Double], Boolean)].collect().toSet
      assert(got === want, "micro-batch boundaries changed admission results")
      // restart with the same checkpoint: AvailableNow re-run must be a
      // no-op (no new files), not a duplicate replay of processed ones
      CorpusIngest.ingestDedupStreaming(spark, s"$base/src", corpus,
        "text", "doc_id", s"$base/out", s"$base/ckpt", jaccardThreshold = 0.5)
      assert(spark.read.parquet(s"$base/out").count() === streamed.count(),
        "restart replayed already-processed files")
      // at-least-once REPLAY (crash between parquet commit and checkpoint
      // advance, here emulated as the worst case — a fresh checkpoint
      // replays EVERY batch with the same deterministic batch ids): each
      // batch overwrites its own batch_id=<id> partition dir, so readers
      // of outDir see identical content, not appended duplicates
      CorpusIngest.ingestDedupStreaming(spark, s"$base/src", corpus,
        "text", "doc_id", s"$base/out", s"$base/ckpt2", jaccardThreshold = 0.5)
      val replayed = spark.read.parquet(s"$base/out")
        .select("id", "dup_of", "jaccard", "is_new")
        .as[(Long, Option[Long], Option[Double], Boolean)].collect().toSet
      assert(replayed === want, "full replay must overwrite, never duplicate")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("indexed streaming admission == sequential indexed batches; index grows; replay is byte-stable") {
    // unique-token texts: only planted duplicates can cross the threshold
    def doc(i: Long, extra: String = "") =
      (i, s"doc $i token${i}a token${i}b token${i}c token${i}d token${i}e$extra")
    val corpus = spark.createDataFrame((1L to 10L).map(i => doc(i)))
      .toDF("doc_id", "text")
    // file A: novel 100, corpus-dup 300 (== corpus doc 3)
    // file B: near-dup 200 of 100 (one appended token, J = 0.8), novel 400
    val fileA = spark.createDataFrame(Seq(
      doc(100L), (300L, doc(3L)._2))).toDF("doc_id", "text")
    val fileB = spark.createDataFrame(Seq(
      (200L, doc(100L)._2 + " tailtok"), doc(400L))).toDF("doc_id", "text")

    val base = java.nio.file.Files.createTempDirectory("graft_ingest_idx").toString
    try {
      // pin file->batch order by EXPLICIT mtimes (no sleep: filesystems
      // with coarse timestamp granularity could land both files in one
      // micro-batch under a wall-clock gap); fileA's part is identified
      // by listing BETWEEN the writes, not by comparing ambiguous mtimes
      def partFiles() = new java.io.File(s"$base/src").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .toSet
      def pinMtime(fs: Set[java.io.File], ms: Long) = fs.foreach(f =>
        java.nio.file.Files.setLastModifiedTime(f.toPath,
          java.nio.file.attribute.FileTime.fromMillis(ms)))
      fileA.coalesce(1).write.parquet(s"$base/src")
      val partsA = partFiles()
      fileB.coalesce(1).write.mode("append").parquet(s"$base/src")
      val partsB = partFiles() -- partsA
      assert(partsA.size === 1 && partsB.size === 1,
        s"expected one part file per write, got ${partsA.size}/${partsB.size}")
      pinMtime(partsA, 1700000000000L)
      pinMtime(partsB, 1700000005000L)
      CorpusIngest.seedIndex(corpus, "text", "doc_id",
        s"$base/idx", s"$base/txt")
      CorpusIngest.ingestDedupIndexedStreaming(spark, s"$base/src",
        "text", "doc_id", s"$base/idx", s"$base/txt", s"$base/out",
        s"$base/ckpt", jaccardThreshold = 0.5)

      val out = spark.read.parquet(s"$base/out")
      assert(out.select("batch_id").distinct().count() === 2,
        "expected two micro-batches")
      type V = (Long, Option[Long], Option[Double], Boolean)
      implicit val vEnc: org.apache.spark.sql.Encoder[V] =
        org.apache.spark.sql.Encoders.product[
          (Long, Option[Long], Option[Double], Boolean)]
      val got = out.select("id", "dup_of", "jaccard", "is_new")
        .as[V].collect().toSet
      val byId = got.map(v => v._1 -> v).toMap
      // corpus dup rejected against the base index; novels admitted
      assert(byId(300L)._2.contains(3L) && !byId(300L)._4)
      assert(byId(100L)._4 && byId(400L)._4)
      // CROSS-BATCH blocking — the growth this variant adds over the
      // static-corpus loop: 200 near-dups batch-0-admitted 100, so it must
      // be rejected with dup_of = 100 even though 100 is not in the corpus
      assert(byId(200L)._2.contains(100L) && !byId(200L)._4,
        s"batch-1 doc must dedup against batch-0 admission: ${byId(200L)}")

      // sequential replication: same batches (derived from the output's
      // batch_id partitions), manual incrementalDedupIndexed + appends
      val incoming = fileA.unionByName(fileB)
      val batchIds = out.select("batch_id").distinct()
        .as[Long].collect().sorted
      var idx = Dedup.buildBandIndex(corpus, "text", "doc_id",
        metricTag = "seq_base")
      var txt = corpus.select(col("doc_id"), col("text"))
      val seq = scala.collection.mutable.Set.empty[V]
      for (b <- batchIds) {
        val ids = out.filter(col("batch_id") === b).select("id").as[Long].collect()
        val batch = incoming.filter(col("doc_id").isin(ids: _*))
        val v = Dedup.incrementalDedupIndexed(idx, txt, batch, "text", "doc_id",
          jaccardThreshold = 0.5).localCheckpoint()
        seq ++= v.as[V].collect()
        val admitted = batch.join(
          v.filter(col("is_new")).select(col("id").as("doc_id")), "doc_id")
        idx = idx.unionByName(Dedup.buildBandIndex(admitted, "text", "doc_id",
          metricTag = s"seq_$b"))
        txt = txt.unionByName(admitted.select(col("doc_id"), col("text")))
      }
      assert(got === seq.toSet,
        "stream admission diverged from sequential indexed batches")

      // index grew by exactly the admitted docs' band partitions
      val idxState = spark.read.parquet(s"$base/idx")
        .select("band", "band_key", "dup_of", "batch_id")
        .as[(Int, Long, Long, Long)].collect().sorted.toSeq
      assert(idxState.exists(_._3 === 100L) && idxState.exists(_._3 === 400L))
      assert(!idxState.exists(_._3 === 200L) && !idxState.exists(_._3 === 300L),
        "rejected docs must not enter the index")

      // worst-case at-least-once replay (fresh checkpoint, same config):
      // every batch reads only strictly-earlier partitions and overwrites
      // its own, so verdicts AND index state come back byte-stable.
      // A planted partition from a fictional longer prior run must be
      // CLEARED by batch 0's stale-partition reset, not read as an
      // earlier admission (the changed-config fresh-checkpoint hazard)
      val planted = new java.io.File(s"$base/idx/batch_id=7")
      planted.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(planted, "poison.txt").toPath, Array[Byte](1))
      CorpusIngest.ingestDedupIndexedStreaming(spark, s"$base/src",
        "text", "doc_id", s"$base/idx", s"$base/txt", s"$base/out",
        s"$base/ckpt2", jaccardThreshold = 0.5)
      assert(!planted.exists(), "stale batch_id=7 partition must be cleared at batch 0")
      val replayed = spark.read.parquet(s"$base/out")
        .select("id", "dup_of", "jaccard", "is_new").as[V].collect().toSet
      assert(replayed === got, "replay changed verdicts")
      val idxReplayed = spark.read.parquet(s"$base/idx")
        .select("band", "band_key", "dup_of", "batch_id")
        .as[(Int, Long, Long, Long)].collect().sorted.toSeq
      assert(idxReplayed === idxState, "replay changed index state")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("band-index compaction: admitted partitions merge; later admissions see identical state") {
    // the text-side twin of AnnLifecycleSpec's compaction pins: admitted
    // band/text partitions are immutable and serving filters
    // batch_id < k, so the file-level merge must not change any verdict
    def doc(i: Long, extra: String = "") =
      (i, s"doc $i token${i}a token${i}b token${i}c token${i}d token${i}e$extra")
    val corpus = spark.createDataFrame((1L to 10L).map(i => doc(i)))
      .toDF("doc_id", "text")
    val batch0 = spark.createDataFrame(Seq(
      doc(100L), (300L, doc(3L)._2))).toDF("doc_id", "text")
    val batch1 = spark.createDataFrame(Seq(
      (200L, doc(100L)._2 + " tailtok"), doc(400L))).toDF("doc_id", "text")
    // the probe batch: an exact dup of the batch-1 admission (identical
    // sigs -> guaranteed band collision; a near-dup suffix here drew the
    // deterministic ~0.5% no-collision outcome for this id pair), a
    // near-dup of the batch-0 admission, and a novel — every index tier
    // must answer
    val batch2 = spark.createDataFrame(Seq(
      (500L, doc(400L)._2),
      (600L, doc(100L)._2 + " othertok"),
      doc(700L))).toDF("doc_id", "text")
    type V = (Long, Option[Long], Option[Double], Boolean)
    implicit val vEnc: org.apache.spark.sql.Encoder[V] =
      org.apache.spark.sql.Encoders.product[
        (Long, Option[Long], Option[Double], Boolean)]

    def runTo2(root: String, compactFirst: Boolean): Set[V] = {
      CorpusIngest.seedIndex(corpus, "text", "doc_id", s"$root/idx", s"$root/txt")
      CorpusIngest.admitBatchIndexed(spark, batch0, 0L, "text", "doc_id",
        s"$root/idx", s"$root/txt", s"$root/out", jaccardThreshold = 0.5)
      CorpusIngest.admitBatchIndexed(spark, batch1, 1L, "text", "doc_id",
        s"$root/idx", s"$root/txt", s"$root/out", jaccardThreshold = 0.5)
      if (compactFirst)
        CorpusIngest.compactAdmitted(spark, s"$root/idx", s"$root/txt", 0L, 1L)
      CorpusIngest.admitBatchIndexed(spark, batch2, 2L, "text", "doc_id",
        s"$root/idx", s"$root/txt", s"$root/out", jaccardThreshold = 0.5)
        .select(col("id"), col("dup_of"), col("jaccard"), col("is_new"))
        .as[V].collect().toSet
    }

    val a = java.nio.file.Files.createTempDirectory("graft_bandcomp_a").toString
    val b = java.nio.file.Files.createTempDirectory("graft_bandcomp_b").toString
    try {
      val plain = runTo2(a, compactFirst = false)
      val compacted = runTo2(b, compactFirst = true)
      assert(plain.nonEmpty && plain === compacted,
        "compaction changed admission verdicts")
      // the probe batch exercised cross-tier blocking (not vacuous)
      val byId = compacted.map(v => v._1 -> v).toMap
      assert(byId(500L)._2.contains(400L) && !byId(500L)._4)
      assert(byId(600L)._2.contains(100L) && !byId(600L)._4)
      assert(byId(700L)._4)
      // partitions merged on both artifacts, files dropped
      import graft.sources.Compaction
      assert(Compaction.admittedBatchIds(spark, s"$b/idx") === Seq(-1L, 1L, 2L))
      assert(Compaction.admittedBatchIds(spark, s"$b/txt") === Seq(-1L, 1L, 2L))
      assert(Compaction.dataFileCount(spark, s"$b/idx") <
        Compaction.dataFileCount(spark, s"$a/idx"),
        "compaction must shrink the band index's file count")
    } finally {
      Seq(a, b).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }
}
