package graft

/**
 * Shared helpers for the streaming folds. One definition of timestamp
 * precision for the whole package: every stateful operator that orders or
 * compares event times must do it in MICROSECONDS — the engine-wide
 * timestamp precision ([[graft.sources.Tables]] truncates ns to µs) —
 * because `Timestamp.getTime` truncates to milliseconds and silently
 * mis-orders / mis-admits sub-millisecond boundaries. The ms-epoch copies
 * that used to live per-file are exactly where two such bugs crept in
 * (StreamingFunnel, StatefulPipelines — fixed r12).
 *
 * Serving bootstrap: every stream builder takes `schema:
 * Option[StructType]`. Pass the source schema explicitly for always-on
 * serving — an empty source directory at start time then works (files
 * picked up as they arrive). When None, the schema is inferred from the
 * existing parquet footers via [[resolveSourceSchema]], which requires at
 * least one file to be present — fine for replay/backfill, wrong for a
 * serving process that boots before its producer.
 */
package object streaming {

  /** Epoch microseconds of a java.sql.Timestamp (getTime ms + sub-ms). */
  private[streaming] def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Inverse of [[micros]]: µs-exact Timestamp (floorDiv/floorMod so
    * pre-epoch instants round toward -inf consistently). */
  private[streaming] def tsFromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Source schema for a parquet-dir stream: the explicit one when given
    * (empty-dir-safe serving bootstrap), else inferred from the files
    * already in `sourceDir` (throws on an empty dir — batch/replay only). */
  private[streaming] def resolveSourceSchema(
      spark: org.apache.spark.sql.SparkSession,
      sourceDir: String,
      schema: Option[org.apache.spark.sql.types.StructType])
      : org.apache.spark.sql.types.StructType =
    schema.getOrElse(spark.read.parquet(sourceDir).schema)
}
