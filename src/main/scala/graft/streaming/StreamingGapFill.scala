package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming daily gap-fill — the stateful counterpart of
 * [[graft.operators.EventAnalytics.gapFill]], on the same
 * `flatMapGroupsWithState` contract as [[StreamingFunnel]].
 *
 * Emission model (the batch operator's joinless "run ownership", in stream
 * form): each observed day OWNS the gap run up to (not including) the
 * user's next observed day, so a run becomes emittable exactly when the
 * FIRST event of a LATER day arrives — the anchor row (that day's exact
 * DECIMAL(18,2) sum, or NULL -> gap when every value was NULL) plus one
 * `is_gap` row per skipped day, all carrying the last non-NULL daily sum
 * forward. CLOSED-RUN CONTRACT: a stream can never know the current
 * anchor day is over, so each user's final (still-open) anchor is emitted
 * only on state timeout — the streaming output equals the batch output
 * minus the per-user last-anchor rows until then (pinned in the spec).
 * The batch replay DOES see each group's end and flushes the final anchor,
 * so [[rowsBatch]] equals the batch operator row-for-row.
 *
 * Determinism: day sums accumulate in EXACT CENTS (long, the
 * [[StatefulPipelines.toCents]] DECIMAL(18,2) semantics), and cents/100.0
 * is the correctly-rounded double of the same rational — bit-equal to the
 * batch operator's CAST(SUM(DECIMAL) AS DOUBLE). Events fold in
 * (epoch-day, event_id) order; intra-day order cannot change a sum.
 *
 * STATE & EVICTION: per-user state is one open run — (anchor day, cents,
 * saw-non-NULL, carried fill) — constant bytes per user. The event-time
 * timeout flushes the open anchor row and drops the state; a user
 * returning later starts a fresh series (their pre-gap fill value is gone,
 * matching the eviction horizon), where the batch form would have bridged
 * the whole gap — size `retentionMs` to the longest gap the analysis must
 * bridge.
 */
object StreamingGapFill {

  /** `ed`: epoch day of the event; `cents`: value as DECIMAL(18,2) cents,
    * None when the value is NULL. */
  case class GEvent(event_id: Long, user_id: Long, ed: Long, cents: Option[Long])
  /** One open run: [[anchorEd]] = Long.MinValue means "no run yet". */
  case class RunState(anchorEd: Long, sumCents: Long, sawValue: Boolean,
                      fillCents: Option[Long])
  case class GapRow(user_id: Long, day: String, day_value: Option[Double],
                    filled_value: Option[Double], is_gap: Boolean)

  val EmptyState: RunState = RunState(Long.MinValue, 0L, false, None)

  private def dayStr(ed: Long): String = java.time.LocalDate.ofEpochDay(ed).toString

  /** Emit the rows the CLOSED run [anchor, nextEd) owns. `nextEd` =
    * anchor's own day for a final flush (no gap rows). */
  private[graft] def closeRun(userId: Long, st: RunState, nextEd: Long): (RunState, List[GapRow]) = {
    val obs = if (st.sawValue) Some(st.sumCents) else None
    val fill = obs.orElse(st.fillCents)
    val fillD = fill.map(_ / 100.0)
    val anchor = GapRow(userId, dayStr(st.anchorEd), obs.map(_ / 100.0), fillD, !st.sawValue)
    val gaps = ((st.anchorEd + 1) until nextEd).iterator
      .map(d => GapRow(userId, dayStr(d), None, fillD, true)).toList
    (RunState(st.anchorEd, st.sumCents, st.sawValue, fill), anchor :: gaps)
  }

  /** Pure transition: fold one event into the open run, emitting the run
    * it closes (if any). */
  private[graft] def step(userId: Long, st: RunState, e: GEvent): (RunState, List[GapRow]) = {
    if (st.anchorEd == Long.MinValue)
      (RunState(e.ed, e.cents.getOrElse(0L), e.cents.isDefined, None), Nil)
    else if (e.ed == st.anchorEd)
      (RunState(st.anchorEd, st.sumCents + e.cents.getOrElse(0L),
        st.sawValue || e.cents.isDefined, st.fillCents), Nil)
    else {
      val (closed, rows) = closeRun(userId, st, e.ed)
      (RunState(e.ed, e.cents.getOrElse(0L), e.cents.isDefined, closed.fillCents), rows)
    }
  }

  private def foldSorted(userId: Long, events: Iterator[GEvent],
                         init: RunState): (RunState, List[GapRow]) = {
    val out = List.newBuilder[GapRow]
    var st = init
    events.foreach { e =>
      val (st2, rows) = step(userId, st, e)
      st = st2
      out ++= rows
    }
    (st, out.result())
  }

  /** The shared (event_id, user_id, ed, cents[, ts]) projection — cents is
    * CAST(value AS DECIMAL(18,2)) * 100, NULL-preserving, the exact-sum
    * convention both replays share. */
  private def project(events: DataFrame, eventType: String, withTs: Boolean): DataFrame = {
    val base = events.filter(col("event_type") === eventType)
      .select(Seq(col("event_id"), col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("ed"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents")) ++
        (if (withTs) Seq(col("ts")) else Nil): _*)
    base
  }

  /** Batch form: replay each user's events in (ed, event_id) order and
    * flush the final open run at group end — equals
    * [[graft.operators.EventAnalytics.gapFill]] row-for-row. */
  def rowsBatch(events: DataFrame, eventType: String = "purchase"): Dataset[GapRow] = {
    implicit val rowEnc = Encoders.product[GapRow]
    implicit val evEnc = Encoders.product[GEvent]
    implicit val longEnc = Encoders.scalaLong
    project(events, eventType, withTs = false).as[GEvent]
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ed").asc, col("event_id").asc) { (uid, it) =>
        val (st, rows) = foldSorted(uid, it, EmptyState)
        val flush = if (st.anchorEd == Long.MinValue) Nil
                    else closeRun(uid, st, st.anchorEd)._2
        (rows ++ flush).iterator
      }
  }

  /** The unterminated streaming Dataset (no sink): closed runs emit as
    * soon as a later-day event arrives; the open anchor flushes on the
    * event-time timeout (see class doc). */
  def rowStream(spark: SparkSession, sourceDir: String,
                eventType: String = "purchase",
                watermark: String = "2 hours",
                retentionMs: Long = 90L * 24 * 3600 * 1000,
                schema: Option[StructType] = None): Dataset[GapRow] = {
    implicit val rowEnc = Encoders.product[GapRow]
    implicit val stateEnc = Encoders.product[RunState]
    implicit val longEnc = Encoders.scalaLong
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val src = spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
    type Row5 = (Long, Long, Long, Option[Long], java.sql.Timestamp)
    val evs = project(src, eventType, withTs = true)
      .as[Row5](Encoders.product[(Long, Long, Long, Option[Long], java.sql.Timestamp)])
    evs.groupByKey(_._2)
      .flatMapGroupsWithState[RunState, GapRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Row5], state: GroupState[RunState]) =>
          if (state.hasTimedOut) {
            // flush the open anchor, then forget the user (fresh series on
            // return — the documented eviction horizon)
            val st = state.getOption.getOrElse(EmptyState)
            state.remove()
            if (st.anchorEd == Long.MinValue) Iterator.empty
            else closeRun(userId, st, st.anchorEd)._2.iterator
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._3, r._1))
            val maxTs = sorted.iterator.map(_._5.getTime).foldLeft(Long.MinValue)(math.max)
            val (st, out) = foldSorted(userId,
              sorted.iterator.map(r => GEvent(r._1, r._2, r._3, r._4)),
              state.getOption.getOrElse(EmptyState))
            state.update(st)
            if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + retentionMs)
            out.iterator
          }
      }
  }

  /** Streaming form behind a memory sink (one AvailableNow pass). */
  def rowsStreaming(spark: SparkSession, sourceDir: String,
                    eventType: String = "purchase",
                    watermark: String = "2 hours",
                    retentionMs: Long = 90L * 24 * 3600 * 1000,
                    queryName: String = "gapfill_rows",
                    schema: Option[StructType] = None): DataFrame = {
    val q = rowStream(spark, sourceDir, eventType, watermark, retentionMs, schema)
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
