package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming SCD2 maintenance — the serving sibling of
 * [[graft.operators.EventAnalytics.scd2]]: a CDC feed folds into per-key
 * dimension state, and every attribute change emits the CLOSED previous
 * version as an append-only row. The open (current) version lives in
 * `GroupState` — it is unemittable under Append semantics until the next
 * change closes it (or, optionally, until idle-state eviction finalizes
 * it, see `emitFinalOnTimeout`).
 *
 * The change transition is the same null-safe run-collapsing as the batch
 * operator ([[step]] is a pure function shared by nothing else — attr
 * `Option` equality IS `<=>`), so the streamed closed rows are bit-equal
 * to the batch build's `is_current = false` rows, version numbers
 * included: version counters persist in state across micro-batches.
 * StreamingScd2Spec pins that parity and the batch == stream-union
 * invariance under multi-batch (time-sliced) arrival.
 *
 * Ordering contract (the package-wide one): readings sort µs-exact by
 * (ts, id) WITHIN each micro-batch; across batches they fold in arrival
 * order on top of held state — a CDC feed is time-ordered per key, which
 * is exactly the regime where this equals the global-sort batch replay.
 * Out-of-order arrivals older than the open version are watermark
 * territory, not retro-editable state.
 *
 * State is ONE small row per key (attr, open-version start, counter),
 * bounded by the keyspace, and evictable: the event-time timeout drops a
 * key's state `retentionMs` after its newest reading, so an always-on
 * dimension maintainer over a churning keyspace holds state only for
 * recently-active keys. With `emitFinalOnTimeout = true` the eviction
 * emits the open version (`valid_to` NULL, `is_current` true) — the
 * finalize-on-retire row a downstream dimension table upserts last.
 */
object Scd2Serving {

  case class Reading(user_id: Long, attr: Option[Long], ts: Timestamp,
                     event_id: Long)
  case class VersionRow(user_id: Long, attr: Option[Long],
                        valid_from: Timestamp, valid_to: Option[Timestamp],
                        version: Long, is_current: Boolean)
  /** Open-version state: the run's attr, its start (µs), and the 1-based
    * version counter already consumed by CLOSED rows + this open one. */
  case class KeyState(attr: Option[Long], validFromMicros: Long, version: Long)

  /** Pure transition: fold one reading into the open-version state,
    * emitting the closed predecessor on a (null-safe) attribute change. */
  private[graft] def step(st: Option[KeyState], r: Reading)
      : (KeyState, Option[VersionRow]) = st match {
    case None =>
      (KeyState(r.attr, micros(r.ts), 1L), None)
    case Some(s) if s.attr == r.attr =>
      (s, None) // run continues; Option equality is the <=> of the batch op
    case Some(s) =>
      val closed = VersionRow(r.user_id, s.attr, tsFromMicros(s.validFromMicros),
        Some(r.ts), s.version, is_current = false)
      (KeyState(r.attr, micros(r.ts), s.version + 1), Some(closed))
  }

  /** The unterminated streaming Dataset of closed (and, on eviction,
    * finalized) version rows. Callers attach their sink;
    * [[scd2Streaming]] is the memory-sink convenience. */
  def scd2Stream(spark: SparkSession, sourceDir: String,
                 eventType: String, attr: Column,
                 watermark: String = "2 hours",
                 retentionMs: Long = 4L * 3600 * 1000,
                 emitFinalOnTimeout: Boolean = false,
                 schema: Option[StructType] = None): Dataset[VersionRow] = {
    implicit val readingEnc = Encoders.product[Reading]
    implicit val rowEnc = Encoders.product[VersionRow]
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val longEnc = Encoders.scalaLong
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
      .filter(col("event_type") === eventType)
      .select(col("user_id"), attr.cast("long").as("attr"), col("ts"),
        col("event_id"))
      .as[Reading]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[KeyState, VersionRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, readings: Iterator[Reading], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            val fin = state.getOption.map { s =>
              VersionRow(userId, s.attr, tsFromMicros(s.validFromMicros),
                None, s.version, is_current = true)
            }
            state.remove()
            if (emitFinalOnTimeout) fin.iterator else Iterator.empty
          } else {
            var st = state.getOption
            val out = List.newBuilder[VersionRow]
            var maxTs = Long.MinValue
            // µs-exact within-batch order (package contract): a ms sort
            // would fold same-millisecond readings by id instead of time
            readings.toSeq.sortBy(r => (micros(r.ts), r.event_id)).foreach { r =>
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
              val (next, closed) = step(st, r)
              st = Some(next)
              out ++= closed
            }
            st.foreach(state.update)
            if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + retentionMs)
            out.result().iterator
          }
      }
  }

  /** Streaming form behind a memory sink (one AvailableNow pass). */
  def scd2Streaming(spark: SparkSession, sourceDir: String,
                    eventType: String, attr: Column,
                    watermark: String = "2 hours",
                    retentionMs: Long = 4L * 3600 * 1000,
                    queryName: String = "scd2_versions",
                    emitFinalOnTimeout: Boolean = false,
                    schema: Option[StructType] = None): DataFrame = {
    val rows = scd2Stream(spark, sourceDir, eventType, attr, watermark,
      retentionMs, emitFinalOnTimeout, schema)
    val q = rows.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
