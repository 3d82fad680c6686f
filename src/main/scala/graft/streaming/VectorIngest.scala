package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.SimilaritySearch
import graft.sources.Compaction

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
                       vecCol: String = "embedding",
                       scales0: Option[Array[Double]] = None): Unit = {
    if (batchId == 0L) CorpusIngest.clearAdmittedPartitions(spark, indexDir)
    val scales = scales0.getOrElse(readScales(spark, scalesDir))
    SimilaritySearch.sq8EncodeCorpus(batch, scales, vecCol)
      .select(col(idCol), col(vecCol), col("__sq8"))
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
  }

  /** Retract vectors from the growing index WITHOUT rewriting its
    * immutable batch partitions: append the ids to a tombstone frame
    * that [[knnIndexed]]/[[knnIndexedIvf]] anti-join at serve time and
    * [[compactBatches]] purges physically at its next rewrite — the
    * standard delete path for an append-only index (the codes stay
    * frozen; only the serve-time view shrinks). The frame is
    * deletion-sized (ids only, never vectors), so the serve-side
    * anti-join broadcasts it. Appending the same id twice is harmless:
    * readers deduplicate. Reference analogue: the upload loop replacing
    * roster rows wholesale (main.py:146) — here retraction is targeted. */
  def addTombstones(spark: SparkSession, ids: DataFrame,
                    tombstonesDir: String,
                    idCol: String = "vec_id"): Unit =
    ids.select(col(idCol)).write.mode("append").parquet(tombstonesDir)

  /** The serve-time delete filter: anti-join `df` against the tombstone
    * ids (deduplicated, broadcast — the tombstone frame is ids-only and
    * deletion-sized by contract). A missing/empty tombstone dir filters
    * nothing, so serving paths can pass the dir unconditionally. */
  private def dropTombstoned(spark: SparkSession, df: DataFrame,
                             tombstonesDir: Option[String],
                             idCol: String): DataFrame =
    tombstonesDir match {
      case Some(dir) =>
        val path = new org.apache.hadoop.fs.Path(dir)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(path)) df
        else df.join(
          broadcast(spark.read.parquet(dir).select(col(idCol)).distinct()),
          Seq(idCol), "left_anti")
      case None => df
    }

  /** Batch ids currently admitted under `indexDir` (hive `batch_id=`
    * dirs), ascending — the compaction planner's input. */
  def admittedBatchIds(spark: SparkSession, indexDir: String): Seq[Long] =
    Compaction.admittedBatchIds(spark, indexDir)

  /** Data-file count under `dir` (recursive, non-hidden) — the
    * small-files metric compaction exists to shrink; exposed so specs and
    * maintenance jobs can assert the drop. */
  def dataFileCount(spark: SparkSession, dir: String): Int =
    Compaction.dataFileCount(spark, dir)

  /**
   * Compact the admitted batch partitions `fromBatch..toBatch`
   * (inclusive) into the single partition `batch_id=toBatch` — the
   * vector-index analogue of [[graft.sources.Compaction]], closing the
   * growth story's lifecycle gap: a long-running serve admits one
   * `batch_id=` directory per micro-batch, and at 100 TB that
   * small-files accumulation degrades every probe (per-file open cost,
   * tiny row groups, driver-side listing). Because the codes are
   * IMMUTABLE and the scales/centroids frozen at seed time, compaction
   * is a pure file rewrite — no re-encode, no re-cell — so serving
   * results are byte-identical before and after (AnnServingSpec pins
   * it; the ss_knn_sq8_compact oracle replays the compacted index
   * against the same SQL as the uncompacted one).
   *
   * Output file count follows [[Compaction]]'s actual-byte sizing. The
   * IVF tier (a `cell` column present) is rewritten hash-partitioned by
   * `cell` and hive-laid-out `cell=` again, so the probe join's
   * partition pruning survives compaction (one file per cell per size
   * target — the cell is the pruning unit).
   *
   * `tombstonesDir` purges retracted ids physically during the rewrite
   * (the [[addTombstones]] lifecycle: serve-time anti-join until the
   * next compaction, gone from disk after). Tombstones for ids outside
   * the compacted range keep applying at serve time — purge here is a
   * space reclaim, not the correctness mechanism.
   *
   * Crash safety: the rewrite lands in a hidden `.compact_tmp` dir
   * (invisible to partition discovery), the covered `batch_id=` dirs
   * are dropped only after it completes, and the rename is last — a
   * crash mid-rewrite leaves the original partitions serving. Only
   * compact ranges wholly at-or-below the serving watermark: merged
   * rows take `batch_id=toBatch`, so an `uptoBatch` INSIDE the range
   * would lose its prefix view (the immutable-history contract).
   */
  def compactBatches(spark: SparkSession, indexDir: String,
                     fromBatch: Long, toBatch: Long,
                     targetBytes: Long = 128L << 20,
                     tombstonesDir: Option[String] = None,
                     idCol: String = "vec_id"): Unit =
    Compaction.compactBatchPartitions(spark, indexDir, fromBatch, toBatch,
      targetBytes, dropIds = tombstonesDir.map(d => (d, idCol)))

  /**
   * Health stats of the grown index, per admitted batch — the re-seed
   * signal the frozen-quantizer design owes its operator: scales and
   * coarse centroids freeze at seed time (correctly — re-deriving would
   * re-encode/re-cell the corpus), so drift shows up as (a) SQ8 CLAMP
   * SATURATION — codes pinned at ±127 because a later batch stretched a
   * dimension's range past the seed's absmax — and (b) CELL IMBALANCE —
   * batches concentrating in few cells because the seed's centroids no
   * longer span the data. Both are computed from the PERSISTED artifact
   * (codes + cells), map-side aggregates only, no vector math.
   *
   * Returns one row per batch: (batch_id, n_vecs, max_cell, imbalance,
   * n_sat, sat_rate) where imbalance = max cell occupancy / mean
   * occupancy over `nlist` cells (1.0 = perfectly even; → nlist as a
   * batch collapses into one cell; NULL for a flat index), and sat_rate
   * = fraction of code slots at ±127 (the seed's own rate is the
   * baseline — each dimension's absmax row sits at exactly 127 by
   * construction; a JUMP above it is the "time to re-seed" signal,
   * AnnServingSpec pins one by admitting an out-of-range batch).
   */
  def indexStats(spark: SparkSession, indexDir: String,
                 nlist: Int): DataFrame = {
    // stats cover SERVABLE vectors only: >= 1 nonzero code, the dn > 0
    // criterion every serving path applies (an all-zero-codes row — NULL
    // or sub-quantum vector — never scores, so it isn't index health)
    val idx = spark.read.parquet(indexDir).filter(col("__sq8").isNotNull)
      .filter(exists(col("__sq8"), c => c =!= 0))
    val hasCell = idx.columns.contains("cell")
    val satPerRow = aggregate(col("__sq8"),
      lit(0L), (acc, c) => acc + when(abs(c) === 127, 1L).otherwise(0L))
    val base = idx.groupBy(col("batch_id").cast("long").as("batch_id"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(satPerRow).as("n_sat"),
        sum(size(col("__sq8")).cast("long")).as("n_slots"))
    val withCell =
      if (!hasCell) base.withColumn("max_cell", lit(null).cast("long"))
      else {
        val cells = idx.groupBy(col("batch_id").cast("long").as("batch_id"),
            col("cell").cast("long").as("cell"))
          .agg(count(lit(1)).as("cn"))
          .groupBy("batch_id").agg(max(col("cn")).as("max_cell"))
        base.join(cells, Seq("batch_id"), "left")
      }
    withCell.select(col("batch_id"), col("n_vecs"), col("max_cell"),
        round(col("max_cell") * lit(nlist.toLong) / col("n_vecs"), 5)
          .as("imbalance"),
        col("n_sat"),
        round(col("n_sat") / col("n_slots"), 5).as("sat_rate"))
  }

  /** kNN against the admitted index state up to `uptoBatch` (inclusive;
    * the seed lives at batch_id = -1, so the default serves everything
    * admitted so far): [[SimilaritySearch.sq8KnnCoded]] over the pruned
    * codes scan + exact re-rank from the co-persisted raw vectors. */
  def knnIndexed(spark: SparkSession, indexDir: String, scalesDir: String,
                 queries: DataFrame, k: Int,
                 rerank: Int = SimilaritySearch.DefaultRerank,
                 uptoBatch: Long = Long.MaxValue,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 scales0: Option[Array[Double]] = None,
                 tombstonesDir: Option[String] = None): DataFrame = {
    val scales = scales0.getOrElse(readScales(spark, scalesDir))
    val coded = dropTombstoned(spark,
      spark.read.parquet(indexDir)
        .filter(col("batch_id") <= uptoBatch).drop("batch_id"),
      tombstonesDir, idCol)
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
                          vecCol: String = "embedding",
                          scales0: Option[Array[Double]] = None,
                          cents0: Option[Array[(Long, Array[Float])]] = None): Unit = {
    if (batchId == 0L) CorpusIngest.clearAdmittedPartitions(spark, indexDir)
    val scales = scales0.getOrElse(readScales(spark, scalesDir))
    val cents = cents0.getOrElse(readCentroids(spark, centroidsDir))
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
                    nprobe: Int = SimilaritySearch.DefaultNprobe,
                    rerank: Int = SimilaritySearch.DefaultRerank,
                    uptoBatch: Long = Long.MaxValue,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    scales0: Option[Array[Double]] = None,
                    cents0: Option[Array[(Long, Array[Float])]] = None,
                    tombstonesDir: Option[String] = None): DataFrame = {
    val scales = scales0.getOrElse(readScales(spark, scalesDir))
    val cents = cents0.getOrElse(readCentroids(spark, centroidsDir))
    val coded = dropTombstoned(spark,
      spark.read.parquet(indexDir)
        .filter(col("batch_id") <= uptoBatch).drop("batch_id"),
      tombstonesDir, idCol)
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
    // frozen artifacts are immutable for the life of the index — read them
    // ONCE per run, not once per micro-batch (bounded either way, but a
    // long-running serve pays two parquet reads per admission for nothing)
    val scales = readScales(spark, scalesDir)
    val cents = readCentroids(spark, centroidsDir)
    val stream = spark.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId == 0L) CorpusIngest.clearAdmittedPartitions(spark, outDir)
        admitVectorBatchIvf(spark, batch, batchId, indexDir, scalesDir,
          centroidsDir, idCol, vecCol, scales0 = Some(scales),
          cents0 = Some(cents))
        knnIndexedIvf(spark, indexDir, scalesDir, centroidsDir, queries, k,
          nprobe, rerank, uptoBatch = batchId, idCol = idCol, vecCol = vecCol,
          scales0 = Some(scales), cents0 = Some(cents))
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
   * of the corpus-so-far for the approximate pass; the frozen scales are
   * read ONCE per run and carried through the loop in the closure
   * ([[SimilaritySearch.scaleBuilds]] stays flat, spec-pinned).
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
    // frozen scales read ONCE per run (see the IVF loop's rationale)
    val scales = readScales(spark, scalesDir)
    val stream = spark.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId == 0L) CorpusIngest.clearAdmittedPartitions(spark, outDir)
        admitVectorBatch(spark, batch, batchId, indexDir, scalesDir,
          idCol, vecCol, scales0 = Some(scales))
        knnIndexed(spark, indexDir, scalesDir, queries, k, rerank,
          uptoBatch = batchId, idCol = idCol, vecCol = vecCol,
          scales0 = Some(scales))
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
