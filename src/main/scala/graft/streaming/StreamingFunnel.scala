package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming ordered-step funnel — the stateful counterpart of
 * [[graft.operators.EventAnalytics.funnel]], built on the same
 * `flatMapGroupsWithState` contract as [[StatefulPipelines]]: identical
 * pure transitions in batch (sorted replay) and streaming (GroupState),
 * event-time timeout bounding per-user state, per-batch iterator sort.
 *
 * Emission model: one `Reach` row the moment a user reaches a step —
 * step 1 at their first `steps(0)` event, step i>1 at the first
 * `steps(i-1)` event at-or-after the step-(i-1) reach time and within
 * `windowHours` of the step-1 reach time. Counting distinct users per
 * step over the emitted rows reproduces the batch funnel's `n_users`
 * exactly (the chain is monotone, each step fires at most once per
 * funnel life).
 *
 * ORDER CONTRACT (same as [[StatefulPipelines]]): transitions fold in
 * (ts, step-index, event_id) order. The step-index tiebreak is what makes
 * the fold BIT-EQUAL to the window-min chain on same-instant events: the
 * window form lets a click at exactly `s1` qualify (`ts >= s1`), so the
 * fold must apply the view before the click when they share a timestamp.
 * Streaming delivers micro-batch iterators sorted per batch only — with
 * in-event-time-order batches (AvailableNow over one source batch, or
 * date-partitioned replay) the stream equals the batch replay row-for-row.
 *
 * STATE & EVICTION: per-user state is the k reach timestamps (k = number
 * of steps — bytes, not events). The event-time timeout drops a user's
 * state `retentionMs` after their newest event; a returning user then
 * starts a FRESH funnel (re-entry semantics — their next `steps(0)` event
 * re-emits step 1). Size retention to the funnel window: state past
 * `s1 + windowHours` can only suppress re-entry, never change reaches.
 */
object StreamingFunnel {

  /** `step_idx`: this event's 0-based position in the step list, or -1 —
    * precomputed so both replays sort by it on ts ties (see order
    * contract). */
  case class FEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                    step_idx: Int)
  /** Reach times per step, MICROSECOND epoch ([[Unset]] = not reached):
    * getTime-ms state would admit sub-millisecond-early step events and
    * mis-order same-millisecond folds relative to the µs-precision batch
    * operator (EventAnalytics.funnel compares full timestamps). */
  case class FunnelState(times: Seq[Long])
  case class Reach(user_id: Long, step: Int, step_name: String,
                   reach_ts: java.sql.Timestamp)

  val Unset: Long = Long.MinValue

  /** Pure transition: fold one event into the reach-times array, emitting
    * the step reached (if any). Mutates `times` in place. */
  private[graft] def step(times: Array[Long], e: FEvent,
                          windowUs: Long): Option[Int] = {
    val i = e.step_idx
    val t = micros(e.ts)
    if (i < 0 || times(i) != Unset) None
    else if (i == 0) { times(0) = t; Some(0) }
    else if (times(i - 1) != Unset && t >= times(i - 1) &&
             t <= times(0) + windowUs) {
      times(i) = t; Some(i)
    } else None
  }

  private def foldSorted(userId: Long, events: Iterator[FEvent],
                         times: Array[Long], steps: IndexedSeq[String],
                         windowUs: Long): Iterator[Reach] = {
    val out = List.newBuilder[Reach]
    events.foreach { e =>
      step(times, e, windowUs).foreach { i =>
        out += Reach(userId, i + 1, steps(i), e.ts)
      }
    }
    out.result().iterator
  }

  private def toFEvents(events: DataFrame, steps: Seq[String]): Dataset[FEvent] = {
    implicit val enc = Encoders.product[FEvent]
    val idx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (st, i)) =>
        when(col("event_type") === st, lit(i)).otherwise(acc)
      }
    events.select(col("event_id"), col("user_id"), col("ts"),
      idx.cast("int").as("step_idx")).as[FEvent]
  }

  /** Batch form: replay each user's events in (ts, step_idx, event_id)
    * order through [[step]]. One shuffle on user_id, sort within groups
    * only. Counting distinct users per step equals
    * [[graft.operators.EventAnalytics.funnel]] exactly. */
  def reachBatch(events: DataFrame, steps: Seq[String],
                 windowHours: Int = 24): Dataset[Reach] = {
    require(steps.size >= 2 && steps.distinct.size == steps.size, s"bad steps $steps")
    implicit val reachEnc = Encoders.product[Reach]
    implicit val longEnc = Encoders.scalaLong
    val stepsIdx = steps.toIndexedSeq
    val windowUs = windowHours * 3600L * 1000000L
    toFEvents(events, steps)
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ts").asc, col("step_idx").asc,
        col("event_id").asc) { (uid, it) =>
        foldSorted(uid, it, Array.fill(stepsIdx.size)(Unset), stepsIdx, windowUs)
      }
  }

  /** The unterminated streaming Dataset (no sink) — same state machine
    * held in GroupState with an event-time timeout (see class doc). */
  def reachStream(spark: SparkSession, sourceDir: String, steps: Seq[String],
                  windowHours: Int = 24, watermark: String = "2 hours",
                  retentionMs: Long = 48L * 3600 * 1000,
                  schema: Option[StructType] = None): Dataset[Reach] = {
    require(steps.size >= 2 && steps.distinct.size == steps.size, s"bad steps $steps")
    implicit val reachEnc = Encoders.product[Reach]
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val longEnc = Encoders.scalaLong
    val stepsIdx = steps.toIndexedSeq
    val windowUs = windowHours * 3600L * 1000000L
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val src = spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
    toFEvents(src, steps)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Reach](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, events: Iterator[FEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove() // re-entry semantics: next steps(0) event re-opens
            Iterator.empty
          } else {
            val times = state.getOption
              .map(_.times.toArray)
              .getOrElse(Array.fill(stepsIdx.size)(Unset))
            var maxTs = Long.MinValue
            // µs sort — getTime would collapse same-millisecond events
            // onto (step_idx, event_id) order, diverging from the batch
            // replay's full-timestamp sort
            val sorted = events.toSeq
              .sortBy(e => (micros(e.ts), e.step_idx, e.event_id))
            sorted.foreach(e => if (e.ts.getTime > maxTs) maxTs = e.ts.getTime)
            val out = foldSorted(userId, sorted.iterator, times, stepsIdx,
              windowUs).toList
            state.update(FunnelState(times.toSeq))
            if (maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs + retentionMs)
            out.iterator
          }
      }
  }

  /** Streaming form behind a memory sink (one AvailableNow pass). */
  def reachStreaming(spark: SparkSession, sourceDir: String,
                     steps: Seq[String], windowHours: Int = 24,
                     watermark: String = "2 hours",
                     retentionMs: Long = 48L * 3600 * 1000,
                     queryName: String = "funnel_reach",
                     schema: Option[StructType] = None): DataFrame = {
    val q = reachStream(spark, sourceDir, steps, windowHours, watermark,
        retentionMs, schema)
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
