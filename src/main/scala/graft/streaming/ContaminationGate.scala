package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.TextAnalysis

/**
 * Streaming decontamination gate: incoming crawl documents are screened
 * against a FIXED eval/benchmark n-gram Bloom sketch before they ever
 * enter the training corpus — the ingest-side counterpart of the batch
 * [[TextAnalysis.contaminationBloom]] pass, on the serving contract of
 * [[DsirServing]] / [[AnnServing]]:
 *
 *  - The sketch is built ONCE per run ([[TextAnalysis.evalGramSketch]],
 *    one scan + mergeable partial OR) — or passed in pre-built (the
 *    production shape: benchmarks change rarely, crawl streams daily).
 *  - Each micro-batch runs ONLY [[TextAnalysis.suspectGramCount]]: a
 *    row-local pass over each document's distinct grams against the
 *    reference-object sketch — no explode, no join, no shuffle, no
 *    state store. A 100 TB/day crawl screens at scan speed.
 *  - The gate FAILS CLOSED: `quarantined` is true iff any gram might be
 *    in the eval set. Bloom filters have no false negatives, so a
 *    contaminated document can NEVER pass the gate; clean documents are
 *    quarantined only at the sketch's false-positive rate and recovered
 *    by the exact batch confirm downstream.
 *  - Verdicts depend only on (document, sketch) — micro-batch
 *    boundaries cannot change them (union == batch, pinned) — and
 *    per-batch `batch_id=` overwrite partitions absorb at-least-once
 *    replay. The explicit schema boots on an empty source dir.
 */
object ContaminationGate {

  /** Returns THIS run's sketch-build tally (0 with a pre-built sketch,
    * 1 otherwise). */
  def gateStreaming(spark: SparkSession, sourceDir: String,
                    evalDocs: => DataFrame, outDir: String,
                    checkpointDir: String, n: Int = 3,
                    numBits: Int = 1 << 20, numHashes: Int = 5,
                    maxFilesPerTrigger: Int = 1,
                    sketch0: Option[Array[Byte]] = None,
                    schema: StructType = DsirServing.DocSchema): Long = {
    var built = 0L
    val sketch = sketch0.getOrElse {
      built += 1
      TextAnalysis.evalGramSketch(evalDocs, "text", "doc_id", n, numBits, numHashes)
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.select(col("doc_id"),
            TextAnalysis.suspectGramCount(col("text"), sketch, n)
              .as("n_suspect_grams"))
          .withColumn("quarantined", col("n_suspect_grams") > 0L)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    built
  }
}
