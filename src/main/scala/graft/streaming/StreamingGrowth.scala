package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming growth accounting — the stateful counterpart of
 * [[graft.operators.EventAnalytics.growthAccounting]], on the same
 * `flatMapGroupsWithState` contract as [[StreamingRetention]]: identical
 * pure transitions in batch (sorted replay) and streaming (GroupState).
 *
 * Emission model: one `StatusCell` the FIRST time a user is active in a
 * calendar week — `new` when it is their first week ever, `retained` when
 * the previous active week was week-1, `resurrected` otherwise. All three
 * are decidable AT EVENT TIME from two longs of state (first and last
 * active week), so the fold is append-only. CHURN is deliberately NOT
 * emitted by the fold: a user's churn at week w+1 is only knowable once
 * week w+1 has passed without activity, which in a stream means waiting on
 * the watermark — but it is fully DERIVABLE from the activity cells (churn
 * rows are exactly the gaps in each user's week sequence), so
 * [[aggregateCells]] reconstructs them with one lead() over the compacted
 * (user, week) frame — bounded by users x active weeks, never by events —
 * and reproduces the batch operator's output row-for-row, including its
 * trailing-churn clip at the last globally-active week.
 *
 * ORDER CONTRACT (same as [[StreamingFunnel]]): the fold consumes events
 * in (week, event_id) order; batch replay sorts within groups, streaming
 * sorts each micro-batch's iterator. The state tracks the SET of emitted
 * active weeks (within [[HorizonWeeks]] of the newest), so a cross-batch
 * straggler for an already-emitted week is a clean no-op (never a
 * duplicate cell — aggregateCells would double-count the user otherwise)
 * and a straggler for a NEW week gets the correct retained/resurrected
 * label from week-1 membership. What out-of-order delivery can still get
 * wrong is `new` attribution: the first week SEEN is labeled new and
 * append mode cannot retract it, so a straggler older than every tracked
 * week reads `resurrected` where an in-order replay says `new`/`retained`
 * (pinned by StreamingGrowthLtvSpec) — deliver batches in event-time
 * order for row-for-row equality.
 *
 * STATE & EVICTION: two longs + at most [[HorizonWeeks]] week entries per
 * user. The event-time timeout drops state `retentionMs` after the user's
 * newest event; a returning user then re-enters as `new` — the standard
 * production approximation for unbounded user lifetimes, sized so the
 * analysis horizon ends before eviction.
 */
object StreamingGrowth {

  /** `week`: epoch-day of the event `div` 7 — the batch operator's integer
    * week arithmetic, computed in DataFrame-land so both replays share one
    * expression. */
  case class GEvent(event_id: Long, user_id: Long, week: Long)
  /** `weeks`: the emitted active weeks within [[HorizonWeeks]] of `last`,
    * ascending — the dedup/label memory that keeps cross-batch stragglers
    * from double-counting (see class doc). */
  case class GrowthState(first: Long, last: Long, weeks: Seq[Long])
  case class StatusCell(user_id: Long, week: Long, status: String)

  val EmptyState: GrowthState = GrowthState(Long.MinValue, Long.MinValue, Seq.empty)

  /** Active-week memory horizon: stragglers further than this below the
    * newest active week would re-emit their cell, but the event-time
    * watermark (hours) plus state eviction make a 120-week-late event
    * unreachable in any real replay; the bound keeps state at <= ~1 KB
    * per user for arbitrarily long-lived users. */
  val HorizonWeeks: Long = 120L

  /** Pure transition: fold one event into the state, emitting the week's
    * status cell iff this week has not been emitted before. In-order
    * replay is bit-identical to the old (first, last)-only fold — week-1
    * membership coincides with week == last + 1 when weeks ascend. */
  private[graft] def step(st: GrowthState, e: GEvent): (GrowthState, Option[StatusCell]) =
    if (st.first == Long.MinValue)
      (GrowthState(e.week, e.week, Seq(e.week)),
        Some(StatusCell(e.user_id, e.week, "new")))
    else if (st.weeks.contains(e.week)) (st, None)
    else {
      val status = if (st.weeks.contains(e.week - 1)) "retained" else "resurrected"
      val mx = math.max(st.last, e.week)
      val weeks = (st.weeks :+ e.week).filter(_ >= mx - HorizonWeeks).sorted
      (GrowthState(st.first, mx, weeks),
        Some(StatusCell(e.user_id, e.week, status)))
    }

  private def foldSorted(events: Iterator[GEvent],
                         init: GrowthState): (GrowthState, List[StatusCell]) = {
    val out = List.newBuilder[StatusCell]
    var st = init
    events.foreach { e =>
      val (st2, cell) = step(st, e)
      st = st2
      cell.foreach(out += _)
    }
    (st, out.result())
  }

  private def weekCol(tsCol: String) =
    expr(s"CAST(datediff(CAST($tsCol AS DATE), DATE '1970-01-01') AS BIGINT) div 7")

  /** Batch form: replay each user's events in (week, event_id) order. One
    * shuffle on user_id. */
  def cellsBatch(events: DataFrame): Dataset[StatusCell] = {
    implicit val cellEnc = Encoders.product[StatusCell]
    implicit val longEnc = Encoders.scalaLong
    implicit val evEnc = Encoders.product[GEvent]
    events.select(col("event_id"), col("user_id"), weekCol("ts").as("week"))
      .as[GEvent]
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("week").asc, col("event_id").asc) { (_, it) =>
        foldSorted(it, EmptyState)._2.iterator
      }
  }

  /** The unterminated streaming Dataset (no sink) — same state machine in
    * GroupState with an event-time timeout (see class doc). */
  def cellStream(spark: SparkSession, sourceDir: String,
                 watermark: String = "2 hours",
                 retentionMs: Long = 90L * 24 * 3600 * 1000,
                 maxFilesPerTrigger: Option[Int] = None,
                 schema: Option[StructType] = None): Dataset[StatusCell] = {
    implicit val cellEnc = Encoders.product[StatusCell]
    implicit val stateEnc = Encoders.product[GrowthState]
    implicit val longEnc = Encoders.scalaLong
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val reader0 = spark.readStream.schema(srcSchema)
    val reader = maxFilesPerTrigger.fold(reader0)(n =>
      reader0.option("maxFilesPerTrigger", n))
    val src = reader.parquet(sourceDir)
      .withWatermark("ts", watermark)
    val evs = src.select(col("event_id"), col("user_id"),
        weekCol("ts").as("week"), col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)](
        Encoders.product[(Long, Long, Long, java.sql.Timestamp)])
    evs.groupByKey(_._2)
      .flatMapGroupsWithState[GrowthState, StatusCell](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[GrowthState]) =>
          if (state.hasTimedOut) {
            state.remove() // re-entry: the next event counts as `new`
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._3, r._1))
            val maxTs = sorted.iterator.map(_._4.getTime).foldLeft(Long.MinValue)(math.max)
            val (st, cells) = foldSorted(
              sorted.iterator.map(r => GEvent(r._1, r._2, r._3)),
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
                     queryName: String = "growth_cells",
                     maxFilesPerTrigger: Option[Int] = None,
                     schema: Option[StructType] = None): DataFrame = {
    val q = cellStream(spark, sourceDir, watermark, retentionMs,
      maxFilesPerTrigger, schema)
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Fold status cells into the batch operator's output frame: churn rows
    * are the gaps in each user's (already-compacted) week sequence, derived
    * with one lead() per user over users x active-weeks rows, then the same
    * weekly pivot + trailing clip as the batch operator. Output ==
    * [[graft.operators.EventAnalytics.growthAccounting]] row-for-row. */
  def aggregateCells(cells: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("week")
    val agged = cells
      .withColumn("__next", lead(col("week"), 1).over(wOrd))
      .select(explode(array(
        struct(col("week"), col("status").as("__status")),
        struct(
          when(col("__next").isNull || col("__next") > col("week") + 1,
            col("week") + 1).as("week"),
          lit("churned").as("__status")))).as("__e"))
      .select(col("__e.week").as("week"), col("__e.__status").as("__status"))
      .filter(col("week").isNotNull)
      .groupBy("week")
      .agg(
        sum(when(col("__status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__status") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("__status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("__status") === "churned", 1L).otherwise(0L)).as("n_churned"))
    val wGlobal = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agged
      .withColumn("__max_active",
        max(when(col("n_new") + col("n_retained") + col("n_resurrected") > 0,
          col("week"))).over(wGlobal))
      .filter(col("week") <= col("__max_active"))
      .drop("__max_active")
  }
}
