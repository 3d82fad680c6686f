package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.Dsir

/**
 * Streaming DSIR serving: a file-source stream of incoming document
 * batches is scored against a FIXED trained importance model
 * ([[Dsir.LlrModel]]) — the data-selection counterpart of [[AnnServing]]
 * on the same serving contract:
 *
 *  - The model is trained ONCE per serving run (one census pass over the
 *    reference corpus, [[Dsir.trainModel]]) — or passed in pre-trained —
 *    BEFORE the stream starts. Each micro-batch then runs ONLY
 *    [[Dsir.scoreWithModel]]: the dense LLR table rides as a codegen
 *    reference object, so per-batch work is one ROW-LOCAL pass over the
 *    batch — no explode, no join, no shuffle, no state store. This is
 *    the crawl-frontier filter shape: at 100 TB/day of incoming crawl,
 *    each executor scores its split against the broadcast table at scan
 *    speed.
 *  - Selection is a FIXED lattice threshold (`thresholdFp`, e.g. the
 *    k-th weight of a batch training run), not per-batch top-k — so a
 *    document's verdict depends only on (document, model, threshold),
 *    micro-batch boundaries cannot change results, and the union of
 *    per-batch outputs equals one batch-mode scoring run (pinned in
 *    DsirServingSpec).
 *  - IDEMPOTENT OUTPUT under at-least-once replay: per-batch hive-style
 *    `batch_id=<id>` overwrite partitions — the [[MatchServing]] /
 *    [[AnnServing]] recipe, with the same SAME-CONFIG requirement.
 *  - EMPTY-DIR BOOTSTRAP: the source schema is explicit ([[DocSchema]]
 *    by default), so the serving process can start before its producer
 *    has written a single file.
 */
object DsirServing {

  /** The incoming-document source schema: (doc_id, text). */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  /** Partition-discovery reader with `batch_id` pinned to LONG (see
    * [[MatchServing.readServed]]). */
  def readServed(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).withColumn("batch_id", col("batch_id").cast("long"))

  /** `model0` lets a serving run reuse a pre-trained LLR table; the
    * default trains one census pass over `corpus` with `isTarget`.
    *
    * Returns THIS run's model-train tally (0 with a pre-trained model,
    * 1 otherwise) — the per-run observability hook DsirServingSpec pins,
    * mirroring [[AnnServing.annStreaming]]'s one-build contract. */
  def dsirStreaming(spark: SparkSession, sourceDir: String,
                    corpus: => DataFrame, isTarget: => Column,
                    outDir: String, checkpointDir: String,
                    thresholdFp: Long, buckets: Int = 4096,
                    maxFilesPerTrigger: Int = 1,
                    model0: Option[Dsir.LlrModel] = None,
                    schema: StructType = DocSchema): Long = {
    // model train, ONCE, before the stream starts: one census pass + one
    // bounded collect; foreachBatch only scores
    var trained = 0L
    val model = model0.getOrElse {
      trained += 1
      Dsir.trainModel(corpus, "text", isTarget, buckets)
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Dsir.scoreWithModel(batch, "text", "doc_id", model)
          .withColumnRenamed("__id", "doc_id")
          .withColumn("selected", col("llr_fp") >= thresholdFp)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    trained
  }
}
