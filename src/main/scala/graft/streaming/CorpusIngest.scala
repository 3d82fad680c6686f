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

  /**
   * One micro-batch of INDEXED dedup admission against a persisted,
   * GROWING band index — the serving-loop unit behind
   * [[ingestDedupIndexedStreaming]], public so the spec (and a driver
   * embedding its own stream) can replay it deterministically.
   *
   * Layout: `indexDir` and `textsDir` are hive-partitioned by `batch_id`
   * — the base corpus index ([[Dedup.buildBandIndex]] output) and its
   * (id, text) side live under `batch_id=-1`; every admitted batch
   * appends its own `batch_id=<id>` partition. Steps:
   *
   *  1. read index + texts FILTERED to `batch_id < batchId` — admission
   *     sees the base corpus plus every PRIOR batch's admissions, never
   *     its own (possibly half-written) partition, so a crash-replay of
   *     batch k computes against the identical index state;
   *  2. [[Dedup.incrementalDedupIndexed]] verdicts -> `outDir/batch_id=k`
   *     (mode overwrite — the [[ingestDedupStreaming]] idempotence recipe);
   *  3. the batch's ADMITTED (is_new) documents band into
   *     `indexDir/batch_id=k` and their texts into `textsDir/batch_id=k`,
   *     also overwrite — so the next batch dedups against them and a
   *     replay rewrites byte-identical state.
   *
   * Within-batch duplicates are not each other's blockers (the
   * [[ingestDedupStreaming]] convention — the periodic corpus-wide
   * compaction owns those), and the append-time banding applies the
   * hot-bucket cap only WITHIN the delta; the global cap is re-applied
   * when compaction rebuilds the base index.
   */
  def admitBatchIndexed(spark: SparkSession, batch: DataFrame, batchId: Long,
                        textCol: String, idCol: String,
                        indexDir: String, textsDir: String, outDir: String,
                        shingleW: Int = 3, numHashes: Int = 32, bands: Int = 8,
                        jaccardThreshold: Double = 0.8,
                        maxBucketSize: Int = 10000): DataFrame = {
    import org.apache.spark.sql.functions.col
    // STALE-PARTITION RESET (fresh-checkpoint hazard): the byte-stable
    // replay contract holds only when a restart reproduces the prior
    // run's file-to-batch grouping. A FRESH checkpoint (this is batch 0 —
    // the stream will re-list and re-admit EVERY source file) over dirs
    // that still hold a prior run's admitted partitions is the hazard
    // case: under a changed grouping (more source files, different
    // maxFilesPerTrigger) the prior run's batch_id= partitions would be
    // read as "earlier admissions" by the batch_id < k filter and poison
    // verdicts. Batch 0 therefore CLEARS every admitted (batch_id >= 0)
    // partition first, resetting admission state to the seed
    // (batch_id=-1) — a same-config replay recomputes byte-identical
    // state (CorpusIngestSpec pins it), and a changed-config restart is
    // now simply a new full run instead of a silently mixed history. A
    // mid-run crash-replay of batch k > 0 never lands here and keeps the
    // plain overwrite-own-partition idempotence.
    if (batchId == 0L)
      Seq(indexDir, textsDir, outDir)
        .foreach(d => clearAdmittedPartitions(spark, d))
    val index = spark.read.parquet(indexDir)
      .filter(col("batch_id") < batchId).drop("batch_id")
    val texts = spark.read.parquet(textsDir)
      .filter(col("batch_id") < batchId).drop("batch_id")
    val verdicts = Dedup.incrementalDedupIndexed(index, texts, batch,
      textCol, idCol, shingleW, numHashes, bands, jaccardThreshold)
      .localCheckpoint() // consumed twice (output + admitted-side writes)
    verdicts.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    val admitted = batch.join(
      verdicts.filter(col("is_new")).select(col("id").as(idCol)), idCol)
    Dedup.buildBandIndex(admitted, textCol, idCol, shingleW, numHashes,
      bands, maxBucketSize, metricTag = s"ingest_idx_$batchId")
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
    admitted.select(col(idCol), col(textCol))
      .write.mode("overwrite").parquet(s"$textsDir/batch_id=$batchId")
    verdicts
  }

  /** Delete every admitted (`batch_id >= 0`) hive partition under `dir` —
    * the [[admitBatchIndexed]] fresh-checkpoint reset (the seed partition
    * `batch_id=-1` is this run's inherited base and is kept). */
  private[streaming] def clearAdmittedPartitions(spark: SparkSession,
                                                 dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      fs.listStatus(path).toSeq
        .filter(_.isDirectory)
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith("batch_id=") &&
            scala.util.Try(n.stripPrefix("batch_id=").toLong).toOption.exists(_ >= 0L)
        }
        .foreach(st => fs.delete(st.getPath, true))
  }

  /** FILE-LEVEL compaction of the growing band index's admitted
    * partitions — the text-side twin of
    * [[VectorIngest.compactBatches]], closing the same small-files
    * lifecycle gap: a long-running ingest admits one `batch_id=`
    * directory per micro-batch under `indexDir` AND `textsDir`; this
    * merges `fromBatch..toBatch` of both into single partitions. Band
    * rows and texts are immutable once admitted and serving filters
    * `batch_id < k`, so the merge (into `batch_id=toBatch`, for ranges
    * wholly below the serving watermark) is a pure file rewrite —
    * CorpusIngestSpec pins that post-compaction admissions produce
    * byte-identical verdicts. This complements (not replaces) the
    * periodic corpus-wide REBUILD ([[seedIndex]] after
    * [[Dedup.corpusDedup]]), which re-applies the global hot-bucket cap;
    * file-level compaction is the cheap maintenance pass between
    * rebuilds. */
  def compactAdmitted(spark: SparkSession, indexDir: String,
                      textsDir: String, fromBatch: Long, toBatch: Long,
                      targetBytes: Long = 128L << 20): Unit = {
    graft.sources.Compaction.compactBatchPartitions(
      spark, indexDir, fromBatch, toBatch, targetBytes)
    graft.sources.Compaction.compactBatchPartitions(
      spark, textsDir, fromBatch, toBatch, targetBytes)
  }

  /** Seed the [[admitBatchIndexed]] layout from a static corpus: band
    * index and (id, text) side under `batch_id=-1`. Run once per base
    * corpus (or per compaction). */
  def seedIndex(corpus: DataFrame, textCol: String, idCol: String,
                indexDir: String, textsDir: String,
                shingleW: Int = 3, numHashes: Int = 32, bands: Int = 8,
                maxBucketSize: Int = 10000): Unit = {
    import org.apache.spark.sql.functions.col
    Dedup.buildBandIndex(corpus, textCol, idCol, shingleW, numHashes, bands,
      maxBucketSize, metricTag = "ingest_idx_base")
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=-1")
    corpus.select(col(idCol), col(textCol))
      .write.mode("overwrite").parquet(s"$textsDir/batch_id=-1")
  }

  /**
   * [[ingestDedupStreaming]] against the PERSISTED, GROWING band index:
   * each micro-batch admits via [[admitBatchIndexed]], so later batches
   * dedup against earlier batches' admissions as well as the base corpus
   * — the production ingest loop made concrete (index build paid once at
   * [[seedIndex]], per-batch cost scales with the delta). Restart-safe
   * WITHOUT the same-config requirement [[ingestDedupStreaming]] carries:
   * every per-batch write is an overwrite of its own `batch_id=`
   * partition, every read is bounded to strictly earlier partitions, and
   * batch 0 resets admitted state to the seed (the fresh-checkpoint
   * stale-partition hazard — see [[admitBatchIndexed]]), so a foreachBatch
   * replay is byte-identical and a changed-config fresh-checkpoint restart
   * is a clean re-run (spec-pinned in CorpusIngestSpec).
   */
  def ingestDedupIndexedStreaming(spark: SparkSession, sourceDir: String,
                                  textCol: String, idCol: String,
                                  indexDir: String, textsDir: String,
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
        admitBatchIndexed(spark, batch, batchId, textCol, idCol,
          indexDir, textsDir, outDir,
          jaccardThreshold = jaccardThreshold): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

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
