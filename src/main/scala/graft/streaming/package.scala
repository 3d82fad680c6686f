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
 */
package object streaming {

  /** Epoch microseconds of a java.sql.Timestamp (getTime ms + sub-ms). */
  private[streaming] def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
}
