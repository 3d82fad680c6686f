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
 * Known serving-bootstrap limitation: most stream builders infer their
 * source schema with `spark.read.parquet(sourceDir).schema`, which fails
 * when the directory is still empty at start time. [[CorpusIngest]] and
 * [[AnnServing]] take/declare explicit schemas for exactly this reason;
 * generalizing a `schema: Option[StructType]` parameter across the other
 * builders is the outstanding serving-hardening item.
 */
package object streaming {

  /** Epoch microseconds of a java.sql.Timestamp (getTime ms + sub-ms). */
  private[streaming] def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
}
