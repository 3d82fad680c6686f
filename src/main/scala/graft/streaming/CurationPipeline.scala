package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.{Dsir, TextAnalysis}

/**
 * One-pass streaming corpus curation: the full ingest decision for each
 * incoming document — decontamination gate, DSIR importance score,
 * selection verdict — computed in a SINGLE row-local projection per
 * micro-batch. Composes the two serving artifacts the engine already
 * trains once per run:
 *
 *  - the eval-gram Bloom sketch ([[TextAnalysis.evalGramSketch]]) probed
 *    by [[TextAnalysis.suspectGramCount]] (fail-closed gate), and
 *  - the DSIR LLR table ([[Dsir.trainModel]]) applied by the
 *    [[graft.functions.DsirScore]] kernel with a fixed lattice
 *    threshold,
 *
 * both riding as codegen reference objects. Per-batch work is therefore
 * ONE scan projection — no explode, no join, no shuffle, no state
 * store; verdict semantics:
 *
 *   quarantined  — some n-gram might be in the eval set (gate fails
 *                  closed; exact confirm runs downstream in batch)
 *   selected     — clean and llr_fp ≥ thresholdFp (target-like)
 *   rejected     — clean but below the importance threshold
 *
 * Verdicts depend only on (document, sketch, model, threshold), so
 * micro-batch boundaries cannot change them (union == batch and
 * == the composition of [[ContaminationGate]] + [[DsirServing]], both
 * pinned in CurationPipelineSpec); per-batch `batch_id=` overwrite
 * partitions absorb at-least-once replay; the explicit schema boots on
 * an empty source dir. At 100 TB/day this is the crawl-frontier loop:
 * every executor curates its split at scan speed against a few KB of
 * broadcast state.
 */
object CurationPipeline {

  /** Returns (modelTrainTally, sketchBuildTally) for this run — each 0
    * when the artifact was passed in pre-built, 1 when built here. */
  def curateStreaming(spark: SparkSession, sourceDir: String,
                      corpus: => DataFrame, isTarget: => Column,
                      evalDocs: => DataFrame,
                      outDir: String, checkpointDir: String,
                      thresholdFp: Long, buckets: Int = 4096, n: Int = 3,
                      numBits: Int = 1 << 20, numHashes: Int = 5,
                      maxFilesPerTrigger: Int = 1,
                      model0: Option[Dsir.LlrModel] = None,
                      sketch0: Option[Array[Byte]] = None,
                      schema: StructType = DsirServing.DocSchema): (Long, Long) = {
    var trained = 0L
    val model = model0.getOrElse {
      trained += 1
      Dsir.trainModel(corpus, "text", isTarget, buckets)
    }
    var sketched = 0L
    val sketch = sketch0.getOrElse {
      sketched += 1
      TextAnalysis.evalGramSketch(evalDocs, "text", "doc_id", n, numBits, numHashes)
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bs = Dsir.featureBuckets(col("text"), model.buckets)
        batch.select(col("doc_id"),
            TextAnalysis.suspectGramCount(col("text"), sketch, n)
              .as("n_suspect_grams"),
            coalesce(size(bs), lit(0)).cast("long").as("n_feats"),
            coalesce(graft.functions.dsir_score(bs, model.llr), lit(0L))
              .as("llr_fp"))
          .withColumn("verdict",
            when(col("n_suspect_grams") > 0L, "quarantined")
              .when(col("llr_fp") >= thresholdFp, "selected")
              .otherwise("rejected"))
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (trained, sketched)
  }

  /**
   * The shard-EMITTING streaming form: where [[curateStreaming]] stops at
   * verdicts, this runs the FULL batch curation
   * ([[graft.operators.Curation.curateBatch]] with the run's frozen
   * model + sketch — zero census scans per batch) on every micro-batch
   * and materializes the selected documents as physical training shards
   * via [[graft.operators.Curation.writeCuratedShards]], one file per
   * (stratum, shard_id) under `outDir/batch_id=<id>/` — the CorpusIngest
   * idempotence recipe: at-least-once replay overwrites the same batch
   * partition, so the trainable output is exactly-once per batch id.
   *
   * Reusing curateBatch wholesale is the no-drift guarantee: verdicts
   * (including the zero-token rejection), packing order (llr DESC, id)
   * and token-exact straddle cuts are the SAME code the batch pipeline
   * runs, so a single-batch stream reproduces `writeCuratedShards` on
   * the same corpus byte-for-byte (spec-pinned). With multiple batches,
   * selection stays batch-invariant (verdicts are row-local against the
   * frozen artifacts) while PACKING is per-batch — each batch_id
   * partition is a self-contained curriculum over its own documents,
   * the shape a crawl-frontier loop wants (ship shards as data lands,
   * re-pack globally offline if a run needs one curriculum).
   *
   * `schema` must cover the stratum column (the default DocSchema has
   * only doc_id/text — pass the corpus schema when stratifying by a
   * corpus column like lang/source).
   */
  def curateStreamingShards(spark: SparkSession, sourceDir: String,
                            corpus: => DataFrame, isTarget: => Column,
                            evalDocs: => DataFrame, stratum: Column,
                            outDir: String, checkpointDir: String,
                            thresholdFp: Long, shardTokens: Long = 2000L,
                            buckets: Int = 4096, n: Int = 3,
                            numBits: Int = 1 << 20, numHashes: Int = 5,
                            maxFilesPerTrigger: Int = 1,
                            model0: Option[Dsir.LlrModel] = None,
                            sketch0: Option[Array[Byte]] = None,
                            schema: StructType = DsirServing.DocSchema): (Long, Long) = {
    var trained = 0L
    val model = model0.getOrElse {
      trained += 1
      Dsir.trainModel(corpus, "text", isTarget, buckets)
    }
    var sketched = 0L
    val sketch = sketch0.getOrElse {
      sketched += 1
      TextAnalysis.evalGramSketch(evalDocs, "text", "doc_id", n, numBits, numHashes)
    }
    val evalFrozen = evalDocs
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val curated = graft.operators.Curation.curateBatch(
          batch, evalFrozen, "text", "doc_id",
          stratum = stratum, isTarget = lit(false), thresholdFp = thresholdFp,
          n = n, numBits = numBits, numHashes = numHashes,
          shardTokens = shardTokens,
          model0 = Some(model), sketch0 = Some(sketch),
          metricTag = "curate_shards")
        graft.operators.Curation.writeCuratedShards(batch, curated,
          "text", "doc_id", shardTokens, s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (trained, sketched)
  }
}
