package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.operators.SimilaritySearch

/**
 * Streaming ANN serving: a file-source stream of query-vector batches is
 * answered against a FIXED corpus with the PQ index ([[SimilaritySearch
 * .pqKnn]]) — the embedding-retrieval counterpart of [[MatchServing]]'s
 * always-on match loop, on the same serving contract:
 *
 *  - The PQ index is built ONCE per serving run: codebooks are collected
 *    at stream start and the encoded corpus ([[SimilaritySearch
 *    .pqEncodeCorpus]]) is materialized into the block-manager cache
 *    BEFORE the stream starts, so each micro-batch runs ONLY the
 *    query-side ADC-table projection, one ADC pass over |batch| x
 *    |corpus codes| — m byte-lookups per pair — and the exact re-rank of
 *    rerank survivors ([[SimilaritySearch.pqKnnEncoded]]). Latency scales
 *    with the request batch; the corpus is never re-collected and never
 *    re-encoded (pinned by AnnServingSpec via
 *    [[SimilaritySearch.codebookBuilds]]). At 100 TB the cached frame
 *    becomes the persisted codes table — the raw vectors stay cold until
 *    re-rank, exactly the PQ scale plan.
 *  - A query's neighbor set depends ONLY on (query vector, corpus), so
 *    micro-batch boundaries cannot change results and the union of
 *    per-batch outputs equals one batch-mode [[SimilaritySearch.pqKnn]]
 *    run over all queries (pinned in AnnServingSpec).
 *  - IDEMPOTENT OUTPUT under at-least-once replay: per-batch hive-style
 *    `batch_id=<id>` overwrite partitions — the [[MatchServing]] /
 *    [[CorpusIngest]] recipe, with the same SAME-CONFIG requirement
 *    (replays must reproduce the batch-to-file assignment; changing
 *    `maxFilesPerTrigger` or pruning the source needs a clean outDir).
 */
object AnnServing {

  /** The query-batch source schema: (query_id, query_vec). */
  val QuerySchema: StructType = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("query_vec", ArrayType(FloatType), nullable = true)))

  /** Partition-discovery reader with `batch_id` pinned to LONG (see
    * [[MatchServing.readServed]]). */
  def readServed(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(outDir).withColumn("batch_id", col("batch_id").cast("long"))
  }

  /** `books0` lets a serving run reuse a pre-trained index (e.g.
    * [[SimilaritySearch.pqCodebooksTrained]]); the default builds the
    * deterministic prefix codebooks from the corpus.
    *
    * Returns THIS run's codebook-build tally (0 with pre-trained books,
    * 1 otherwise) — the per-run observability hook AnnServingSpec pins,
    * so the one-build contract is checkable without assuming the global
    * [[SimilaritySearch.codebookBuilds]] counter is otherwise quiescent. */
  def annStreaming(spark: SparkSession, sourceDir: String,
                   corpus: DataFrame, outDir: String,
                   checkpointDir: String,
                   k: Int = 5, maxFilesPerTrigger: Int = 1,
                   m: Int = 8, ksub: Int = 16, rerank: Int = 32,
                   books0: Option[Array[Array[Array[Double]]]] = None): Long = {
    // index build, ONCE, before the stream starts: one codebook collect +
    // one encode pass, materialized so foreachBatch reads codes from cache
    var built = 0L
    val books = books0.getOrElse {
      built += 1
      SimilaritySearch.pqCodebooks(corpus, m, ksub)
    }
    val codedCorpus = SimilaritySearch.pqEncodeCorpus(corpus, books).persist()
    codedCorpus.count()
    try {
      val stream = spark.readStream.schema(QuerySchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(sourceDir)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          SimilaritySearch.pqKnnEncoded(codedCorpus, books, batch, k, rerank)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally codedCorpus.unpersist()
    built
  }

  /** [[annStreaming]]'s contract for the SQ8 hot tier: scales are derived
    * ONCE per serving run (a dim-bounded collect — the index build), the
    * int8-coded corpus ([[SimilaritySearch.sq8EncodeCorpus]]) is
    * materialized before the stream starts, and every micro-batch runs
    * only [[SimilaritySearch.sq8KnnCoded]] — the codes-dequant approximate
    * pass plus the exact re-rank. Same output layout and idempotence
    * recipe as the PQ loop. `scales0` lets a run reuse persisted scales
    * (zero in-run builds); returns this run's scale-build tally, pinned
    * at one (or zero) by AnnServingSpec via
    * [[SimilaritySearch.scaleBuilds]]. */
  def annStreamingSq8(spark: SparkSession, sourceDir: String,
                      corpus: DataFrame, outDir: String,
                      checkpointDir: String,
                      k: Int = 5, maxFilesPerTrigger: Int = 1,
                      rerank: Int = 32,
                      scales0: Option[Array[Double]] = None): Long = {
    // local tally, NOT a diff of the process-global scaleBuilds counter: a
    // concurrent sq8Scales caller in the same JVM (parallel suites, a
    // second stream) would inflate a counter delta and make the per-run
    // metric unreliable; the global counter stays for cross-run checks
    var built = 0L
    val scales = scales0.getOrElse {
      built += 1
      SimilaritySearch.sq8Scales(corpus)
    }
    val codedCorpus = SimilaritySearch.sq8EncodeCorpus(corpus, scales).persist()
    codedCorpus.count()
    try {
      val stream = spark.readStream.schema(QuerySchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(sourceDir)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          SimilaritySearch.sq8KnnCoded(codedCorpus, scales, batch, k, rerank)
            .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        }
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally codedCorpus.unpersist()
    built
  }
}
