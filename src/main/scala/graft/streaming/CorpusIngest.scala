package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
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
 *  - IDEMPOTENT OUTPUT under at-least-once replay: each batch writes its
 *    own hive-style partition directory `outDir/batch_id=<id>` with
 *    mode("overwrite"). foreachBatch replays a batch (same batchId, same
 *    input files) when a crash lands between the parquet commit and the
 *    checkpoint advance — a plain append would duplicate those rows at the
 *    output path, while overwriting the batch's OWN directory makes replay
 *    a no-op for readers of `outDir` (they see batch_id as a partition
 *    column). This is the standard exactly-once-by-idempotence recipe for
 *    deterministic batches. SAME-CONFIG REQUIREMENT (shared with
 *    [[MatchServing]]): overwrite only absorbs a replay that reproduces
 *    the batch-to-file assignment — same source file set, listing order,
 *    and `maxFilesPerTrigger`; a fresh-checkpoint replay under a changed
 *    trigger config or a shrunk source dir partitions batches differently
 *    and can leave stale `batch_id=` dirs — use a clean `outDir` then.
 *  - `schema` makes the empty-source bootstrap explicit: without it the
 *    source schema is inferred from existing parquet under `sourceDir`,
 *    which fails outright when the directory is empty at start time.
 */
object CorpusIngest {

  def ingestDedupStreaming(spark: SparkSession, sourceDir: String,
                           corpus: DataFrame, textCol: String, idCol: String,
                           outDir: String, checkpointDir: String,
                           jaccardThreshold: Double = 0.8,
                           maxFilesPerTrigger: Int = 1,
                           schema: Option[StructType] = None): Unit = {
    val srcSchema = schema.getOrElse(spark.read.parquet(sourceDir).schema)
    val stream = spark.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Dedup.incrementalDedup(corpus, batch, textCol, idCol,
          jaccardThreshold = jaccardThreshold,
          metricTag = s"ingest_$batchId")
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
