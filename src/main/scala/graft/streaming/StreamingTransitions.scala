package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming user-journey transitions — the stateful counterpart of
 * [[graft.operators.EventAnalytics.transitions]], on the same
 * batch-replay / GroupState contract as [[StreamingAttribution]]: one
 * pure transition function, identical in both replays, per-batch
 * iterator sort, event-time timeout bounding per-user state.
 *
 * Emission model: one [[Transition]] row per adjacent event pair whose
 * gap is within `maxGapHours` (exact integer microseconds). Aggregating
 * emitted rows by (src, dst) — count + distinct users — reproduces the
 * batch operator's matrix exactly.
 *
 * ORDER CONTRACT: the batch `lead` window orders by (ts, event_id); the
 * fold replays events in that same order, so same-timestamp pairs
 * resolve by event_id in both forms.
 *
 * STATE & EVICTION: per-user state is the previous event's (type, ts) —
 * constant bytes. Eviction `maxGapHours` after the user's newest event
 * is LOSSLESS: an expired predecessor is farther than the gap from any
 * future event, so it could only produce the same no-emit that absent
 * state produces.
 */
object StreamingTransitions {

  case class TEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                    event_type: String)
  /** The previous event; ts in epoch micros. */
  case class PrevState(prevType: String, prevUs: Long)
  case class Transition(user_id: Long, src_type: String, dst_type: String,
                        dst_event_id: Long, dst_ts: java.sql.Timestamp)

  /** Pure transition: fold one event against the previous-event state,
    * emitting the (src, dst) pair when the gap qualifies. */
  private[graft] def step(state: Option[PrevState], e: TEvent,
                          gapUs: Long): (Option[PrevState], Option[Transition]) = {
    val emit = state.collect {
      case p if micros(e.ts) - p.prevUs <= gapUs =>
        Transition(e.user_id, p.prevType, e.event_type, e.event_id, e.ts)
    }
    (Some(PrevState(e.event_type, micros(e.ts))), emit)
  }

  private def foldSorted(events: Iterator[TEvent], init: Option[PrevState],
                         gapUs: Long): (Option[PrevState], List[Transition]) = {
    var st = init
    val out = List.newBuilder[Transition]
    events.foreach { e =>
      val (st2, emit) = step(st, e, gapUs)
      st = st2
      emit.foreach(out += _)
    }
    (st, out.result())
  }

  private def toTEvents(events: DataFrame): Dataset[TEvent] = {
    implicit val enc = Encoders.product[TEvent]
    events.select(col("event_id"), col("user_id"), col("ts"),
      col("event_type")).as[TEvent]
  }

  /** Batch form: replay each user's events in (ts, event_id) order.
    * Aggregating by (src, dst) equals
    * [[graft.operators.EventAnalytics.transitions]] exactly. */
  def transitionsBatch(events: DataFrame,
                       maxGapHours: Int = 24): Dataset[Transition] = {
    implicit val outEnc = Encoders.product[Transition]
    implicit val longEnc = Encoders.scalaLong
    val gapUs = maxGapHours.toLong * 3600L * 1000000L
    toTEvents(events)
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ts").asc, col("event_id").asc) { (_, it) =>
        foldSorted(it, None, gapUs)._2.iterator
      }
  }

  /** The unterminated streaming Dataset (no sink). */
  def transitionsStream(spark: SparkSession, sourceDir: String,
                        maxGapHours: Int = 24,
                        watermark: String = "2 hours",
                        schema: Option[StructType] = None): Dataset[Transition] = {
    implicit val outEnc = Encoders.product[Transition]
    implicit val stateEnc = Encoders.product[PrevState]
    implicit val longEnc = Encoders.scalaLong
    val gapUs = maxGapHours.toLong * 3600L * 1000000L
    val retMs = maxGapHours.toLong * 3600L * 1000L
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val src = spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
    toTEvents(src)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PrevState, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, events: Iterator[TEvent], state: GroupState[PrevState]) =>
          if (state.hasTimedOut) {
            // lossless: an expired predecessor is farther than the gap
            // from every future event — no emit either way
            state.remove()
            Iterator.empty
          } else {
            val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val (st, out) = foldSorted(sorted.iterator, state.getOption, gapUs)
            st.foreach(state.update)
            if (sorted.nonEmpty)
              state.setTimeoutTimestamp(sorted.map(_.ts.getTime).max + retMs)
            out.iterator
          }
      }
  }

  /** Streaming form behind a memory sink (one AvailableNow pass). */
  def transitionsStreaming(spark: SparkSession, sourceDir: String,
                           maxGapHours: Int = 24,
                           watermark: String = "2 hours",
                           queryName: String = "transitions",
                           schema: Option[StructType] = None): DataFrame = {
    val q = transitionsStream(spark, sourceDir, maxGapHours, watermark, schema)
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
