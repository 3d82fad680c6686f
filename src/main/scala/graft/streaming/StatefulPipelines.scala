package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Custom per-key streaming state via `flatMapGroupsWithState` (SURVEY.md
 * §2.9 extension surface) — the operator tier below windowed aggregation:
 * arbitrary state machines per key, with event-time timeout bounding state
 * exactly like a watermark bounds a windowed aggregate.
 *
 * The demo operator is an ALERTING state machine over `events`: per user it
 * tracks a running spend total and the count of consecutive `error` events,
 * and emits an alert row whenever a user crosses a spend threshold or logs
 * `MaxErrors` consecutive errors. Both transitions are pure functions of
 * (previous state, event) — the batch form replays the same transitions with
 * a sort-within-group, so the two paths are comparable row-for-row, the same
 * bench-ability contract the windowed pipelines follow.
 *
 * Determinism: spend accumulates in EXACT CENTS (long), never floating
 * point, so the running total and the >= threshold test are independent of
 * addition order and bit-equal to a DECIMAL(18,2) running sum — this is what
 * lets the batch form carry a DuckDB window-SQL oracle. Events fold in
 * (ts, event_id) order — a total order even when timestamps collide.
 */
object StatefulPipelines {

  case class Event(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                   event_type: String, value: Double)
  /** `spendCents`: exact running spend in cents (see scaladoc). */
  case class UserState(spendCents: Long, consecutiveErrors: Int, alertedSpend: Boolean)
  case class Alert(user_id: Long, ts: java.sql.Timestamp, alert_type: String,
                   spend: Double, consecutive_errors: Int)

  val SpendThresholdCents = 50000L // 500.00
  val MaxErrors = 3

  /** Exact binary double -> cents, rounding ties AWAY FROM ZERO — the same
    * semantics as DuckDB's CAST(value AS DECIMAL(18,2)) that the batch
    * oracle uses. `math.round` would round ties toward +inf, desyncing on
    * negative values (refunds) at an exactly-representable .xx5.
    *
    * Corrupt rows must not kill a streaming query: NaN/Infinity and
    * values outside the DECIMAL(18,2) domain (where BigDecimal would
    * throw inside flatMapGroupsWithState) contribute 0 cents. */
  private[graft] val MaxAbsSpend = 9.0e15 // < Long.MaxValue/100 cents
  private[graft] def toCents(value: Double): Long =
    if (java.lang.Double.isNaN(value) || java.lang.Double.isInfinite(value) ||
        math.abs(value) > MaxAbsSpend) 0L
    else new java.math.BigDecimal(value)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Pure transition: fold one event into the state, emitting any alerts. */
  private[graft] def step(st: UserState, e: Event): (UserState, List[Alert]) = {
    val spendCents = st.spendCents + toCents(e.value)
    val errs = if (e.event_type == "error") st.consecutiveErrors + 1 else 0
    var alerts = List.empty[Alert]
    var alertedSpend = st.alertedSpend
    if (!alertedSpend && spendCents >= SpendThresholdCents) {
      alerts ::= Alert(e.user_id, e.ts, "SPEND", spendCents / 100.0, errs)
      alertedSpend = true
    }
    if (errs == MaxErrors) {
      alerts ::= Alert(e.user_id, e.ts, "ERRORS", spendCents / 100.0, errs)
    }
    (UserState(spendCents, errs, alertedSpend), alerts.reverse)
  }

  private def foldSorted(events: Iterator[Event]): Iterator[Alert] = {
    var st = UserState(0L, 0, alertedSpend = false)
    val out = List.newBuilder[Alert]
    events.foreach { e =>
      val (next, alerts) = step(st, e)
      st = next
      out ++= alerts
    }
    out.result().iterator
  }

  /** Batch form: replay each user's events in (ts, event_id) order through
    * the same transition function. One shuffle on user_id; sort within
    * groups only. */
  def alertsBatch(events: DataFrame): Dataset[Alert] = {
    implicit val eventEnc = Encoders.product[Event]
    implicit val alertEnc = Encoders.product[Alert]
    implicit val longEnc = Encoders.scalaLong
    events.select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ts").asc, col("event_id").asc)((_, it) => foldSorted(it))
  }

  /**
   * Streaming form: identical transitions held in GroupState, with an
   * event-time timeout that DROPS idle users' state `retention` after the
   * key's last event — bounded state at any scale. After every update the
   * timeout is re-armed at (max event time in this batch's group +
   * retention); when the watermark passes that, `hasTimedOut` fires and the
   * state is removed. Max-event-time is always >= the current watermark
   * (later rows were already filtered), so the timestamp is always valid.
   *
   * `emitEvictionMarkers = true` makes each eviction observable as an
   * `EVICT` alert row (spend snapshot at eviction, ts = eviction watermark)
   * — used by StatefulPipelinesSpec to prove the timeout path executes, and
   * by operators to audit state churn in production.
   *
   * NB streaming delivers micro-batch iterators sorted per batch only —
   * with AvailableNow over one source batch this matches the batch replay.
   */
  /** The unterminated streaming Dataset (no sink): callers attach a memory
    * sink ([[alertsStreaming]]) or a recoverable file sink (tests restarting
    * from a checkpoint — the memory sink cannot recover one). */
  def alertsStream(spark: SparkSession, sourceDir: String,
                   watermark: String = "2 hours",
                   retentionMs: Long = 4L * 3600 * 1000,
                   emitEvictionMarkers: Boolean = false,
                   schema: Option[StructType] = None): Dataset[Alert] = {
    implicit val eventEnc = Encoders.product[Event]
    implicit val alertEnc = Encoders.product[Alert]
    implicit val stateEnc = Encoders.product[UserState]
    implicit val longEnc = Encoders.scalaLong
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, Alert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, events: Iterator[Event], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val st = state.getOption.getOrElse(UserState(0L, 0, alertedSpend = false))
            state.remove()
            if (emitEvictionMarkers)
              Iterator.single(Alert(userId,
                new java.sql.Timestamp(state.getCurrentWatermarkMs()),
                "EVICT", st.spendCents / 100.0, st.consecutiveErrors))
            else Iterator.empty
          } else {
            var st = state.getOption.getOrElse(UserState(0L, 0, alertedSpend = false))
            val out = List.newBuilder[Alert]
            var maxTs = Long.MinValue
            // µs sort (shared micros helper): the batch replay sorts the
            // full-precision ts column, so a getTime-ms sort here would
            // fold same-millisecond events in (event_id) order instead of
            // true time order and break the bit-equal contract
            events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              if (e.ts.getTime > maxTs) maxTs = e.ts.getTime
              val (next, as) = step(st, e)
              st = next
              out ++= as
            }
            state.update(st)
            // re-arm the idle timeout: state lives `retention` past the
            // key's newest event, then hasTimedOut fires and removes it
            if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + retentionMs)
            out.result().iterator
          }
      }
  }

  /** Streaming form behind a memory sink (one AvailableNow pass). */
  def alertsStreaming(spark: SparkSession, sourceDir: String,
                      watermark: String = "2 hours",
                      retentionMs: Long = 4L * 3600 * 1000,
                      queryName: String = "event_alerts",
                      emitEvictionMarkers: Boolean = false,
                      schema: Option[StructType] = None): DataFrame = {
    val alerts = alertsStream(spark, sourceDir, watermark, retentionMs,
      emitEvictionMarkers, schema)
    val q = alerts.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
