package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup

/**
 * Continuous corpus ingest with near-dup admission: a file-source stream of
 * document batches is admitted against a STATIC existing corpus via
 * [[Dedup.incrementalDedup]] inside `foreachBatch` — the streaming form of
 * ingest-time dedup.
 *
 * Design notes for the 100 TB shape:
 *  - The dedup "state" is the corpus's band index, not Spark streaming
 *    state: nothing accumulates in the state store, so there is no
 *    watermark/eviction tradeoff here (contrast
 *    [[EventPipelines.dedupStreaming]], whose exact-id dedup state must be
 *    watermark-bounded). In production the band index would be a persisted
 *    table rather than recomputed per batch.
 *  - Admission of a document depends ONLY on (document, corpus), never on
 *    other stream batches — so micro-batch boundaries cannot change
 *    results, and the union of per-batch outputs equals one batch-mode run
 *    over all input (pinned in CorpusIngestSpec). Duplicates WITHIN an
 *    ingest window are not each other's blockers by design; the periodic
 *    corpus-wide [[Dedup.corpusDedup]] compaction owns those.
 *  - `foreachBatch` + file sink + checkpoint gives at-least-once delivery
 *    with replay on restart; batch ids ride along for idempotent downstream
 *    merges.
 */
object CorpusIngest {

  def ingestDedupStreaming(spark: SparkSession, sourceDir: String,
                           corpus: DataFrame, textCol: String, idCol: String,
                           outDir: String, checkpointDir: String,
                           jaccardThreshold: Double = 0.8,
                           maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Dedup.incrementalDedup(corpus, batch, textCol, idCol,
          jaccardThreshold = jaccardThreshold,
          metricTag = s"ingest_$batchId")
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
