package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/**
 * Custom per-key streaming state via `flatMapGroupsWithState` (SURVEY.md
 * §2.9 extension surface) — the operator tier below windowed aggregation:
 * arbitrary state machines per key, with event-time timeout bounding state
 * exactly like a watermark bounds a windowed aggregate.
 *
 * The demo operator is an ALERTING state machine over `events`: per user it
 * tracks a running spend total and the count of consecutive `error` events,
 * and emits an alert row whenever a user crosses a spend threshold or logs
 * `maxErrors` consecutive errors. Both transitions are pure functions of
 * (previous state, event) — the batch form replays the same transitions with
 * a sort-within-group, so the two paths are comparable row-for-row, the same
 * bench-ability contract the windowed pipelines follow.
 */
object StatefulPipelines {

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  case class UserState(spend: Double, consecutiveErrors: Int, alertedSpend: Boolean)
  case class Alert(user_id: Long, ts: java.sql.Timestamp, alert_type: String,
                   spend: Double, consecutive_errors: Int)

  val SpendThreshold = 500.0
  val MaxErrors = 3

  /** Pure transition: fold one event into the state, emitting any alerts. */
  private[graft] def step(st: UserState, e: Event): (UserState, List[Alert]) = {
    val spend = st.spend + e.value
    val errs = if (e.event_type == "error") st.consecutiveErrors + 1 else 0
    var alerts = List.empty[Alert]
    var alertedSpend = st.alertedSpend
    if (!alertedSpend && spend >= SpendThreshold) {
      alerts ::= Alert(e.user_id, e.ts, "SPEND", spend, errs)
      alertedSpend = true
    }
    if (errs == MaxErrors) {
      alerts ::= Alert(e.user_id, e.ts, "ERRORS", spend, errs)
    }
    (UserState(spend, errs, alertedSpend), alerts.reverse)
  }

  private def foldSorted(userId: Long, events: Iterator[Event]): Iterator[Alert] = {
    var st = UserState(0.0, 0, alertedSpend = false)
    val out = List.newBuilder[Alert]
    events.foreach { e =>
      val (next, alerts) = step(st, e)
      st = next
      out ++= alerts
    }
    out.result().iterator
  }

  /** Batch form: replay each user's events in ts order through the same
    * transition function. One shuffle on user_id; sort within groups only. */
  def alertsBatch(events: DataFrame): Dataset[Alert] = {
    implicit val eventEnc = Encoders.product[Event]
    implicit val alertEnc = Encoders.product[Alert]
    implicit val longEnc = Encoders.scalaLong
    events.select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ts").asc)((k, it) => foldSorted(k, it))
  }

  /** Streaming form: identical transitions held in GroupState, with an
    * event-time timeout that drops idle users' state (bounded state at any
    * scale; the watermark is the state-retention contract). NB streaming
    * delivers micro-batch iterators in ts order per batch only — with
    * AvailableNow over one source batch this matches the batch replay. */
  def alertsStreaming(spark: SparkSession, sourceDir: String,
                      watermark: String = "2 hours",
                      queryName: String = "event_alerts"): DataFrame = {
    implicit val eventEnc = Encoders.product[Event]
    implicit val alertEnc = Encoders.product[Alert]
    implicit val stateEnc = Encoders.product[UserState]
    implicit val longEnc = Encoders.scalaLong
    val schema = spark.read.parquet(sourceDir).schema
    val alerts = spark.readStream.schema(schema).parquet(sourceDir)
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, Alert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, events: Iterator[Event], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(UserState(0.0, 0, alertedSpend = false))
            val out = List.newBuilder[Alert]
            events.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val (next, as) = step(st, e)
              st = next
              out ++= as
            }
            state.update(st)
            state.getCurrentWatermarkMs()
            out.result().iterator
          }
      }
    val q = alerts.toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
