package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, processed per-partition in bounded batches.
 *
 * The actual media decode is STUBBED (this container has no image/audio
 * codecs) behind [[MediaDecoder]] — a deterministic fake that parses our
 * synthetic header format. Everything Spark-side is real and tested: the
 * schema, the partition-batched `mapPartitions` pipeline (the Scala analogue
 * of `mapInPandas` batch processing), the feature schema, and the
 * repartition-by-size strategy.
 *
 * Scale notes: media rows are fat (MBs); `repartitionForPayload` targets
 * ~`targetBytes` per task using the metadata size column so a 100 TB corpus
 * yields balanced tasks instead of 2 GB parquet-row-group stragglers, without
 * touching the payload bytes during the shuffle (only the key moves first).
 */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),   // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),      // image/video
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))  // audio/video

  case class MediaFeature(media_id: Long, modality: String, n_bytes: Long,
                          feat_dim: Int, features: Array[Float], decode_ok: Boolean)

  /**
   * STUB decoder. A real deployment swaps this for an actual codec call; the
   * signature (bytes -> fixed-dim float features) and the batch shape are the
   * contract the pipeline is built against.
   */
  object MediaDecoder {
    val FeatDim = 16
    /** Deterministic fake "decode": hashes payload windows into a feature
      * vector. Returns None for null/empty payloads (decode failure path). */
    def decodeToFeatures(payload: Array[Byte]): Option[Array[Float]] = {
      if (payload == null || payload.isEmpty) return None
      val out = new Array[Float](FeatDim)
      var i = 0
      while (i < payload.length) {
        val slot = i % FeatDim
        out(slot) = out(slot) + (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      var j = 0
      while (j < FeatDim) { out(j) = out(j) / math.max(1, payload.length / FeatDim); j += 1 }
      Some(out)
    }
  }

  /** Per-partition batched feature extraction (mapPartitions = the JVM
    * analogue of mapInPandas: one iterator per task, bounded memory). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    media.select("media_id", "modality", "payload", "n_bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val feats = MediaDecoder.decodeToFeatures(payload)
          MediaFeature(
            r.getAs[Long]("media_id"), r.getAs[String]("modality"),
            r.getAs[Long]("n_bytes"),
            MediaDecoder.FeatDim,
            feats.getOrElse(Array.empty[Float]),
            feats.isDefined)
        }
      }
  }

  /** Balance fat binary rows into ~targetBytes partitions using the metadata
    * size column (range partition on a computed bucket, payloads move once). */
  def repartitionForPayload(media: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    val totalBytes = media.agg(sum(col("n_bytes"))).first().getLong(0)
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    media.repartitionByRange(parts, col("media_id"))
  }

  /** Synthetic media table for tests/benchmarks (deterministic). */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    import org.apache.spark.sql.functions.{udf => sparkUdf}
    val payloadGen = sparkUdf((id: Long) => {
      val bytes = new Array[Byte](64 + (id % 193).toInt)
      var i = 0
      while (i < bytes.length) { bytes(i) = ((id * 31 + i * 7) % 251).toByte; i += 1 }
      bytes
    })
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("id") % 3 + 1).cast("int")).as("modality"),
      payloadGen(col("id")).as("payload"),
      lit("application/octet-stream").as("mime"),
      (col("id") % 193 + 64).as("n_bytes"),
      lit(64).as("width"), lit(64).as("height"),
      (col("id") % 10000).as("duration_ms"))
  }
}
