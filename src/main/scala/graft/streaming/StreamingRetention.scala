package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming cohort retention — the stateful counterpart of
 * [[graft.operators.EventAnalytics.retention]], on the same
 * `flatMapGroupsWithState` contract as [[StreamingFunnel]]: identical pure
 * transitions in batch (sorted replay) and streaming (GroupState).
 *
 * Emission model: one `Cell` row the FIRST time a user is active in a
 * (cohort_week, week_offset) cell — their first-ever event pins the cohort
 * (epoch-day of first event `div` 7, the batch form's integer arithmetic)
 * and emits offset 0; each later event emits its offset iff unseen.
 * `count_distinct(user_id)` over the emitted cells per (cohort_week,
 * week_offset) therefore reproduces the batch `n_active` exactly, and the
 * offset-0 cells reproduce `cohort_size` — each (user, offset) fires at
 * most once.
 *
 * ORDER CONTRACT (same as [[StreamingFunnel]]): the fold consumes events in
 * (ts, event_id) order; the batch replay sorts within groups, streaming
 * sorts each micro-batch's iterator. The first event fixes `firstEd`, so a
 * cross-batch straggler OLDER than the recorded first event would land in a
 * later cohort than the batch form assigns — deliver batches in event-time
 * order (AvailableNow over one source pass, or date-partitioned replay) for
 * row-for-row equality.
 *
 * STATE & EVICTION: per-user state is `firstEd` plus the set of offsets
 * already emitted — one long per ACTIVE week of the user's lifetime,
 * bounded by calendar weeks, never by events. The event-time timeout drops
 * state `retentionMs` after the user's newest event; a returning user then
 * re-enters as a FRESH cohort member (their next event pins a new
 * `firstEd`) — the standard production approximation for unbounded user
 * lifetimes, sized so the analysis horizon ends before eviction.
 */
object StreamingRetention {

  /** `ed`: epoch day of the event (UTC date diff vs 1970-01-01), the same
    * integer the batch operator derives — computed in DataFrame-land so
    * both replays share one expression. */
  case class REvent(event_id: Long, user_id: Long, ed: Long)
  case class RetentionState(firstEd: Long, emitted: Seq[Long])
  case class Cell(user_id: Long, cohort_week: Long, week_offset: Long)

  /** Pure transition: fold one event into (firstEd, emitted), emitting the
    * newly-reached cell if any. */
  private[graft] def step(st: RetentionState, e: REvent): (RetentionState, Option[Cell]) = {
    if (st.firstEd == Long.MinValue) {
      val cohort = Math.floorDiv(e.ed, 7L)
      (RetentionState(e.ed, Seq(0L)), Some(Cell(e.user_id, cohort, 0L)))
    } else {
      val offset = Math.floorDiv(e.ed - st.firstEd, 7L)
      if (st.emitted.contains(offset)) (st, None)
      else (RetentionState(st.firstEd, st.emitted :+ offset),
        Some(Cell(e.user_id, Math.floorDiv(st.firstEd, 7L), offset)))
    }
  }

  private def foldSorted(events: Iterator[REvent],
                         init: RetentionState): (RetentionState, List[Cell]) = {
    val out = List.newBuilder[Cell]
    var st = init
    events.foreach { e =>
      val (st2, cell) = step(st, e)
      st = st2
      cell.foreach(out += _)
    }
    (st, out.result())
  }

  private def toREvents(events: DataFrame): Dataset[REvent] = {
    implicit val enc = Encoders.product[REvent]
    events.select(col("event_id"), col("user_id"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("ed")).as[REvent]
  }

  val EmptyState: RetentionState = RetentionState(Long.MinValue, Nil)

  /** Batch form: replay each user's events in (ts, event_id) order. One
    * shuffle on user_id. Aggregating the cells reproduces
    * [[graft.operators.EventAnalytics.retention]] exactly (see
    * [[aggregateCells]]). */
  def cellsBatch(events: DataFrame): Dataset[Cell] = {
    implicit val cellEnc = Encoders.product[Cell]
    implicit val longEnc = Encoders.scalaLong
    toREvents(events)
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ed").asc, col("event_id").asc) { (_, it) =>
        foldSorted(it, EmptyState)._2.iterator
      }
  }

  /** The unterminated streaming Dataset (no sink) — same state machine in
    * GroupState with an event-time timeout (see class doc). */
  def cellStream(spark: SparkSession, sourceDir: String,
                 watermark: String = "2 hours",
                 retentionMs: Long = 90L * 24 * 3600 * 1000,
                 schema: Option[StructType] = None): Dataset[Cell] = {
    implicit val cellEnc = Encoders.product[Cell]
    implicit val stateEnc = Encoders.product[RetentionState]
    implicit val longEnc = Encoders.scalaLong
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val src = spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
    // ts rides along only to drive the timeout clock
    val evs = src.select(col("event_id"), col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("ed"), col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)](
        Encoders.product[(Long, Long, Long, java.sql.Timestamp)])
    evs.groupByKey(_._2)
      .flatMapGroupsWithState[RetentionState, Cell](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[RetentionState]) =>
          if (state.hasTimedOut) {
            state.remove() // re-entry: the next event pins a fresh cohort
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._3, r._1))
            val maxTs = sorted.iterator.map(_._4.getTime).foldLeft(Long.MinValue)(math.max)
            val (st, cells) = foldSorted(
              sorted.iterator.map(r => REvent(r._1, r._2, r._3)),
              state.getOption.getOrElse(EmptyState))
            state.update(st)
            if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + retentionMs)
            cells.iterator
          }
      }
  }

  /** Streaming form behind a memory sink (one AvailableNow pass). */
  def cellsStreaming(spark: SparkSession, sourceDir: String,
                     watermark: String = "2 hours",
                     retentionMs: Long = 90L * 24 * 3600 * 1000,
                     queryName: String = "retention_cells",
                     schema: Option[StructType] = None): DataFrame = {
    val q = cellStream(spark, sourceDir, watermark, retentionMs, schema)
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Fold emitted cells into the batch operator's output frame:
    * (cohort_week, week_offset, n_active, cohort_size, retained_frac) ==
    * [[graft.operators.EventAnalytics.retention]] row-for-row. */
  def aggregateCells(cells: DataFrame): DataFrame = {
    val perCell = cells.groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("user_id")).as("n_active"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("cohort_week")
    perCell
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(wc))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size")).as("retained_frac"))
  }
}
