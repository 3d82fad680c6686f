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
}
