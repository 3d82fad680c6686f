package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.SimilaritySearch

/**
 * Incremental vector admission against a persisted, GROWING SQ8 index —
 * the retrieval counterpart of [[CorpusIngest]]'s growing band index, and
 * the growth story [[AnnServing]]'s frozen-corpus loops lack: new corpus
 * batches are encoded with the SEED-FROZEN per-dimension scales into
 * `batch_id=` partitions, and kNN serves against the union of partitions.
 *
 * Design notes for the 100 TB shape:
 *  - The scales are derived ONCE, at [[seedSq8]] (a dim-bounded collect),
 *    and FROZEN: admitted codes are immutable forever after. Re-deriving
 *    absmax scales per batch would re-encode the whole corpus whenever a
 *    new batch stretched a dimension's range — the exact asymmetry the
 *    dedup ingest solved by persisting its band index. Frozen scales can
 *    CLAMP an out-of-range later value to ±127: that is the quantizer's
 *    documented contract (FAISS trains scales on a sample and lives with
 *    saturation), the approximate pass degrades gracefully, and the exact
 *    re-rank scores survivors from the RAW vectors anyway.
 *  - The persisted artifact per batch is `(id, raw vector, int8 codes)`
 *    hive-partitioned by `batch_id`. Serving scans prune to the codes
 *    column (¼ the bytes of float32) for the approximate pass — parquet
 *    column pruning keeps the raw vectors cold until the re-rank join,
 *    the [[SimilaritySearch.sq8KnnCoded]] contract.
 *  - A serve against `batch_id <= k` reads only partitions that are
 *    immutable by construction (earlier batches) or deterministically
 *    rewritten (its own), so crash-replays reproduce results byte-for-
 *    byte, and batch 0 clears stale admitted partitions — the
 *    [[CorpusIngest.admitBatchIndexed]] fresh-checkpoint recipe.
 *
 * Reference analogue: the always-on upload loop (main.py:136) — the
 * corpus grows while the service answers queries.
 */
object VectorIngest {

  /** Seed the growing index: derive the SQ8 scales from the base corpus
    * (the one-off, dim-bounded index build), persist them to `scalesDir`
    * as (d, s) rows — doubles round-trip parquet exactly, so a restart
    * reconstructs bit-identical codes — and write the coded base corpus
    * under `indexDir/batch_id=-1`. Returns the frozen scales. */
  def seedSq8(corpus: DataFrame, indexDir: String, scalesDir: String,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): Array[Double] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val scales = SimilaritySearch.sq8Scales(corpus, vecCol)
    scales.zipWithIndex.map { case (s, d) => (d, s) }.toSeq
      .toDF("d", "s").coalesce(1)
      .write.mode("overwrite").parquet(scalesDir)
    SimilaritySearch.sq8EncodeCorpus(corpus, scales, vecCol)
      .select(col(idCol), col(vecCol), col("__sq8"))
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=-1")
    scales
  }

  /** The frozen scales back from `scalesDir` — exact (double parquet
    * round-trip), so codes encoded before and after a restart agree. */
  def readScales(spark: SparkSession, scalesDir: String): Array[Double] =
    spark.read.parquet(scalesDir).orderBy("d")
      .select("s").collect().map(_.getDouble(0))

  /** Admit one corpus batch: encode with the FROZEN scales and overwrite
    * `indexDir/batch_id=<batchId>` — idempotent under at-least-once
    * replay (the [[CorpusIngest.admitBatchIndexed]] recipe: a replayed
    * deterministic batch rewrites byte-identical codes). Batch 0 first
    * clears stale admitted partitions from any prior run whose
    * file-to-batch grouping this run would not reproduce. */
  def admitVectorBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                       indexDir: String, scalesDir: String,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit = {
    if (batchId == 0L) CorpusIngest.clearAdmittedPartitions(spark, indexDir)
    val scales = readScales(spark, scalesDir)
    SimilaritySearch.sq8EncodeCorpus(batch, scales, vecCol)
      .select(col(idCol), col(vecCol), col("__sq8"))
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
  }

  /** kNN against the admitted index state up to `uptoBatch` (inclusive;
    * the seed lives at batch_id = -1, so the default serves everything
    * admitted so far): [[SimilaritySearch.sq8KnnCoded]] over the pruned
    * codes scan + exact re-rank from the co-persisted raw vectors. */
  def knnIndexed(spark: SparkSession, indexDir: String, scalesDir: String,
                 queries: DataFrame, k: Int, rerank: Int = 32,
                 uptoBatch: Long = Long.MaxValue,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val scales = readScales(spark, scalesDir)
    val coded = spark.read.parquet(indexDir)
      .filter(col("batch_id") <= uptoBatch).drop("batch_id")
    SimilaritySearch.sq8KnnCoded(coded, scales, queries, k, rerank,
      corpusId = idCol, corpusVec = vecCol)
  }

  /** Seed the growing IVF,SQ8 index: the [[seedSq8]] recipe plus the
    * coarse quantizer — deterministic prefix centroids derived from the
    * SEED corpus and FROZEN alongside the scales (re-deriving centroids
    * per batch would re-cell the whole corpus, the same asymmetry frozen
    * scales avoid; FAISS likewise trains the coarse quantizer once and
    * adds forever). The coded seed is written hive-partitioned by `cell`
    * under `batch_id=-1`, the layout [[SimilaritySearch.ivfSq8KnnCoded]]'s
    * probe join prunes. Returns (frozen scales, frozen centroids). */
  def seedIvfSq8(corpus: DataFrame, indexDir: String, scalesDir: String,
                 centroidsDir: String, nCentroids: Int = 16,
                 idCol: String = "vec_id", vecCol: String = "embedding")
      : (Array[Double], Array[(Long, Array[Float])]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val scales = SimilaritySearch.sq8Scales(corpus, vecCol)
    scales.zipWithIndex.map { case (s, d) => (d, s) }.toSeq
      .toDF("d", "s").coalesce(1)
      .write.mode("overwrite").parquet(scalesDir)
    val cents = SimilaritySearch.ivfCentroids(corpus, nCentroids, idCol, vecCol)
    cents.toSeq.toDF("cid", "cvec").coalesce(1)
      .write.mode("overwrite").parquet(centroidsDir)
    SimilaritySearch.ivfSq8EncodeCorpus(corpus, scales, cents, vecCol)
      .select(col(idCol), col(vecCol), col("__sq8"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/batch_id=-1")
    (scales, cents)
  }

  /** The frozen coarse quantizer back from `centroidsDir` — float parquet
    * round-trips exactly, so cell assignment before and after a restart
    * agrees. */
  def readCentroids(spark: SparkSession,
                    centroidsDir: String): Array[(Long, Array[Float])] =
    spark.read.parquet(centroidsDir).orderBy("cid")
      .select("cid", "cvec").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** [[admitVectorBatch]] for the IVF tier: encode with the frozen
    * scales, assign cells with the frozen centroids, overwrite the
    * batch's cell-partitioned directory — the same idempotent-replay and
    * fresh-checkpoint contract. */
  def admitVectorBatchIvf(spark: SparkSession, batch: DataFrame,
                          batchId: Long, indexDir: String, scalesDir: String,
                          centroidsDir: String,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): Unit = {
    if (batchId == 0L) CorpusIngest.clearAdmittedPartitions(spark, indexDir)
    val scales = readScales(spark, scalesDir)
    val cents = readCentroids(spark, centroidsDir)
    SimilaritySearch.ivfSq8EncodeCorpus(batch, scales, cents, vecCol)
      .select(col(idCol), col(vecCol), col("__sq8"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/batch_id=$batchId")
  }

  /** kNN against the grown IVF,SQ8 state up to `uptoBatch`: probe cells
    * from the frozen quantizer, approximate pass over only the probed
    * cells' codes, exact re-rank from the co-persisted raw vectors —
    * [[knnIndexed]] minus its one remaining full-codes scan. */
  def knnIndexedIvf(spark: SparkSession, indexDir: String, scalesDir: String,
                    centroidsDir: String, queries: DataFrame, k: Int,
                    nprobe: Int = 4, rerank: Int = 32,
                    uptoBatch: Long = Long.MaxValue,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val scales = readScales(spark, scalesDir)
    val cents = readCentroids(spark, centroidsDir)
    val coded = spark.read.parquet(indexDir)
      .filter(col("batch_id") <= uptoBatch).drop("batch_id")
    SimilaritySearch.ivfSq8KnnCoded(coded, scales, cents, queries, k,
      nprobe, rerank, corpusId = idCol, corpusVec = vecCol)
  }

  /** [[annStreamingSq8Grow]] on the IVF tier: admission assigns frozen
    * cells, serving probes them — per-batch cost drops from a full
    * codes-column scan of the corpus-so-far to ~nprobe/nCentroids of it.
    * Same replay contract (every read bounded to partitions this batch
    * (re)wrote deterministically or earlier ones); growth parity is
    * pinned by AnnServingSpec. */
  def annStreamingIvfSq8Grow(spark: SparkSession, sourceDir: String,
                             queries: DataFrame, indexDir: String,
                             scalesDir: String, centroidsDir: String,
                             outDir: String, checkpointDir: String,
                             k: Int = 5, nprobe: Int = 4, rerank: Int = 32,
                             maxFilesPerTrigger: Int = 1,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             schema: Option[StructType] = None): Unit = {
    val srcSchema = schema.getOrElse(spark.read.parquet(sourceDir).schema)
    val stream = spark.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId == 0L) CorpusIngest.clearAdmittedPartitions(spark, outDir)
        admitVectorBatchIvf(spark, batch, batchId, indexDir, scalesDir,
          centroidsDir, idCol, vecCol)
        knnIndexedIvf(spark, indexDir, scalesDir, centroidsDir, queries, k,
          nprobe, rerank, uptoBatch = batchId, idCol = idCol, vecCol = vecCol)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /**
   * The serving loop over a GROWING corpus: a file-source stream of
   * corpus-vector batches is admitted against the frozen-scale index
   * ([[admitVectorBatch]]) and the FIXED query set is re-answered against
   * the grown state (`batch_id <= k`), one result partition per batch —
   * so `outDir/batch_id=k` is exactly "what the queries would retrieve
   * after admission k", replayable because every read is bounded to
   * partitions this batch (re)wrote deterministically or earlier ones.
   * Growth parity — stream over a growing corpus == sequential
   * [[admitVectorBatch]] + [[knnIndexed]] calls — is pinned by
   * AnnServingSpec. Per-batch cost: encode(delta) + one codes-column scan
   * of the corpus-so-far for the approximate pass; the scales collect is
   * per-batch but dim-bounded (a parquet footer read, not an index
   * build — [[SimilaritySearch.scaleBuilds]] stays flat, spec-pinned).
   */
  def annStreamingSq8Grow(spark: SparkSession, sourceDir: String,
                          queries: DataFrame, indexDir: String,
                          scalesDir: String, outDir: String,
                          checkpointDir: String,
                          k: Int = 5, rerank: Int = 32,
                          maxFilesPerTrigger: Int = 1,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          schema: Option[StructType] = None): Unit = {
    val srcSchema = schema.getOrElse(spark.read.parquet(sourceDir).schema)
    val stream = spark.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId == 0L) CorpusIngest.clearAdmittedPartitions(spark, outDir)
        admitVectorBatch(spark, batch, batchId, indexDir, scalesDir,
          idCol, vecCol)
        knnIndexed(spark, indexDir, scalesDir, queries, k, rerank,
          uptoBatch = batchId, idCol = idCol, vecCol = vecCol)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
