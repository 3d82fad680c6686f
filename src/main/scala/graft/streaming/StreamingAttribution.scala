package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming last-touch attribution — the stateful counterpart of
 * [[graft.operators.EventAnalytics.attribution]], on the same
 * batch-replay / GroupState contract as [[StreamingFunnel]]: one pure
 * transition function, identical in both replays, per-batch iterator
 * sort, event-time timeout bounding per-user state.
 *
 * Emission model: one [[Attributed]] row per conversion event, credited
 * to the user's latest strictly-preceding touch within `windowHours`
 * (else the `(direct)` channel). Aggregating emitted rows by channel
 * (count / distinct users / DECIMAL(18,2) value sum) reproduces the
 * batch operator's summary exactly.
 *
 * ORDER CONTRACT: the batch window orders by (ts, event_id) with a
 * strictly-preceding ROWS frame, so the fold replays events in that same
 * (ts, event_id) order — a touch sharing a conversion's timestamp counts
 * iff its event_id is smaller (it is a preceding row), which the fold
 * gets for free by processing it first. The deadline test is exact
 * integer MICROseconds (`java.sql.Timestamp` carries them; ms-epoch
 * would mis-decide sub-millisecond boundary gaps the batch form decides
 * by `unix_micros`).
 *
 * STATE & EVICTION: per-user state is ONE (touch type, touch ts) pair —
 * bytes, independent of history length; every new touch overwrites it.
 * The event-time timeout drops state `retentionMs` after the user's
 * newest touch/conversion. `retentionMs` defaults to the attribution
 * window itself, which is LOSSLESS: a touch more than `windowHours`
 * before a conversion can only yield `(direct)` — exactly what absent
 * state yields — so eviction never changes an emitted row.
 */
object StreamingAttribution {

  /** `kind`: 1 = touch, 2 = conversion (other event types are filtered
    * out before the shuffle — they influence neither state nor output). */
  case class AEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                    kind: Int, event_type: String, value: Option[Double])
  /** The single surviving touch; ts in epoch micros. */
  case class TouchState(touchType: String, touchUs: Long)
  case class Attributed(user_id: Long, event_id: Long,
                        conv_ts: java.sql.Timestamp, channel: String,
                        value: Option[Double])

  val DirectChannel = "(direct)"

  /** Epoch MICROseconds of a timestamp (getTime is ms and already carries
    * the fraction's millisecond part; add the sub-ms micros only). */
  /** Pure transition: fold one event into the last-touch state, emitting
    * the attributed conversion (if this event is one). */
  private[graft] def step(state: Option[TouchState], e: AEvent,
                          windowUs: Long): (Option[TouchState], Option[Attributed]) =
    e.kind match {
      case 1 => (Some(TouchState(e.event_type, micros(e.ts))), None)
      case 2 =>
        val channel = state match {
          case Some(t) if micros(e.ts) - t.touchUs <= windowUs => t.touchType
          case _ => DirectChannel
        }
        (state, Some(Attributed(e.user_id, e.event_id, e.ts, channel, e.value)))
      case _ => (state, None)
    }

  private def foldSorted(events: Iterator[AEvent], init: Option[TouchState],
                         windowUs: Long): (Option[TouchState], List[Attributed]) = {
    var st = init
    val out = List.newBuilder[Attributed]
    events.foreach { e =>
      val (st2, emit) = step(st, e, windowUs)
      st = st2
      emit.foreach(out += _)
    }
    (st, out.result())
  }

  private def toAEvents(events: DataFrame, touchTypes: Seq[String],
                        convertType: String): Dataset[AEvent] = {
    implicit val enc = Encoders.product[AEvent]
    events.select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type").isin(touchTypes.map(x => x: Any): _*), 1)
          .when(col("event_type") === convertType, 2)
          .otherwise(0).cast("int").as("kind"),
        col("event_type"), col("value"))
      .filter(col("kind") > 0)
      .as[AEvent]
  }

  /** Batch form: replay each user's touch/conversion events in
    * (ts, event_id) order through [[step]]. One shuffle on user_id,
    * sort within groups only. Channel-aggregating the result equals
    * [[graft.operators.EventAnalytics.attribution]] exactly. */
  def attributedBatch(events: DataFrame,
                      touchTypes: Seq[String] = Seq("view", "click"),
                      convertType: String = "purchase",
                      windowHours: Int = 72): Dataset[Attributed] = {
    require(!touchTypes.contains(convertType), s"$convertType cannot be a touch")
    implicit val outEnc = Encoders.product[Attributed]
    implicit val longEnc = Encoders.scalaLong
    val windowUs = windowHours.toLong * 3600L * 1000000L
    toAEvents(events, touchTypes, convertType)
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ts").asc, col("event_id").asc) { (_, it) =>
        foldSorted(it, None, windowUs)._2.iterator
      }
  }

  /** The unterminated streaming Dataset (no sink) — same transition held
    * in GroupState with an event-time timeout (see class doc). */
  def attributedStream(spark: SparkSession, sourceDir: String,
                       touchTypes: Seq[String] = Seq("view", "click"),
                       convertType: String = "purchase",
                       windowHours: Int = 72,
                       watermark: String = "2 hours",
                       retentionMs: Option[Long] = None,
                       schema: Option[StructType] = None): Dataset[Attributed] = {
    require(!touchTypes.contains(convertType), s"$convertType cannot be a touch")
    implicit val outEnc = Encoders.product[Attributed]
    implicit val stateEnc = Encoders.product[TouchState]
    implicit val longEnc = Encoders.scalaLong
    val windowUs = windowHours.toLong * 3600L * 1000000L
    val retMs = retentionMs.getOrElse(windowHours.toLong * 3600L * 1000L)
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val src = spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
    toAEvents(src, touchTypes, convertType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attributed](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, events: Iterator[AEvent], state: GroupState[TouchState]) =>
          if (state.hasTimedOut) {
            // lossless eviction: surviving state past the window could only
            // ever yield (direct), which absent state yields too
            state.remove()
            Iterator.empty
          } else {
            val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            val (st, out) = foldSorted(sorted.iterator, state.getOption, windowUs)
            st.foreach(state.update)
            if (sorted.nonEmpty) {
              val maxTs = sorted.map(_.ts.getTime).max
              state.setTimeoutTimestamp(maxTs + retMs)
            }
            out.iterator
          }
      }
  }

  /** Streaming form behind a memory sink (one AvailableNow pass). */
  def attributedStreaming(spark: SparkSession, sourceDir: String,
                          touchTypes: Seq[String] = Seq("view", "click"),
                          convertType: String = "purchase",
                          windowHours: Int = 72,
                          watermark: String = "2 hours",
                          queryName: String = "attributed",
                          schema: Option[StructType] = None): DataFrame = {
    val q = attributedStream(spark, sourceDir, touchTypes, convertType,
        windowHours, watermark, schema = schema)
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
