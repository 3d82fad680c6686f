package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming cohort LTV — the stateful counterpart of
 * [[graft.operators.EventAnalytics.cohortLtv]], on the same
 * `flatMapGroupsWithState` contract as [[StreamingRetention]] (whose state
 * machine it extends: the cohort/offset bookkeeping is identical, plus a
 * revenue rider).
 *
 * Emission model: a `LtvCell` fires for an event iff it is the user's
 * first event in a (cohort_week, week_offset) cell (`first_active = true`;
 * exactly once per (user, offset), so counting them reproduces the batch
 * `n_active`/`cohort_size`) OR it carries revenue (`rev = Some(value)` for
 * a revenue-typed event; one cell per purchase so the DECIMAL(18,2)
 * per-event cast + sum in [[aggregateCells]] is bit-identical to the batch
 * aggregate). A purchase that also opens a new offset emits ONE cell with
 * both facets set.
 *
 * ORDER CONTRACT and STATE & EVICTION: as [[StreamingRetention]] — the
 * first event pins `firstEd`, state is firstEd plus one long per active
 * week of the user's lifetime, event-time timeout re-enters returning
 * users as a fresh cohort member.
 */
object StreamingLtv {

  case class LEvent(event_id: Long, user_id: Long, ed: Long, rev: Option[Double])
  case class LtvState(firstEd: Long, emitted: Seq[Long])
  case class LtvCell(user_id: Long, cohort_week: Long, week_offset: Long,
                     first_active: Boolean, rev: Option[Double])

  val EmptyState: LtvState = LtvState(Long.MinValue, Nil)

  /** Pure transition: fold one event into (firstEd, emitted), emitting the
    * cell when it opens an offset or carries revenue. */
  private[graft] def step(st: LtvState, e: LEvent): (LtvState, Option[LtvCell]) = {
    val (st2, firstEd, opened) =
      if (st.firstEd == Long.MinValue) (LtvState(e.ed, Seq(0L)), e.ed, true)
      else {
        val offset = Math.floorDiv(e.ed - st.firstEd, 7L)
        if (st.emitted.contains(offset)) (st, st.firstEd, false)
        else (LtvState(st.firstEd, st.emitted :+ offset), st.firstEd, true)
      }
    val offset = Math.floorDiv(e.ed - firstEd, 7L)
    if (opened || e.rev.isDefined)
      (st2, Some(LtvCell(e.user_id, Math.floorDiv(firstEd, 7L), offset, opened, e.rev)))
    else (st2, None)
  }

  private def foldSorted(events: Iterator[LEvent],
                         init: LtvState): (LtvState, List[LtvCell]) = {
    val out = List.newBuilder[LtvCell]
    var st = init
    events.foreach { e =>
      val (st2, cell) = step(st, e)
      st = st2
      cell.foreach(out += _)
    }
    (st, out.result())
  }

  private def edCol(tsCol: String) =
    datediff(col(tsCol).cast("date"), lit("1970-01-01").cast("date")).cast("long")

  private def revCol(typeCol: String, valueCol: String, revenueType: String) =
    when(col(typeCol) === revenueType, col(valueCol))

  /** Batch form: replay each user's events in (ed, event_id) order. One
    * shuffle on user_id. */
  def cellsBatch(events: DataFrame, revenueType: String = "purchase"): Dataset[LtvCell] = {
    implicit val cellEnc = Encoders.product[LtvCell]
    implicit val longEnc = Encoders.scalaLong
    implicit val evEnc = Encoders.product[LEvent]
    events.select(col("event_id"), col("user_id"), edCol("ts").as("ed"),
        revCol("event_type", "value", revenueType).as("rev"))
      .as[LEvent]
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("ed").asc, col("event_id").asc) { (_, it) =>
        foldSorted(it, EmptyState)._2.iterator
      }
  }

  /** The unterminated streaming Dataset (no sink) — same state machine in
    * GroupState with an event-time timeout (see class doc). */
  def cellStream(spark: SparkSession, sourceDir: String,
                 revenueType: String = "purchase",
                 watermark: String = "2 hours",
                 retentionMs: Long = 90L * 24 * 3600 * 1000,
                 schema: Option[StructType] = None): Dataset[LtvCell] = {
    implicit val cellEnc = Encoders.product[LtvCell]
    implicit val stateEnc = Encoders.product[LtvState]
    implicit val longEnc = Encoders.scalaLong
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val src = spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
    val evs = src.select(col("event_id"), col("user_id"), edCol("ts").as("ed"),
        revCol("event_type", "value", revenueType).as("rev"), col("ts"))
      .as[(Long, Long, Long, Option[Double], java.sql.Timestamp)](
        Encoders.product[(Long, Long, Long, Option[Double], java.sql.Timestamp)])
    evs.groupByKey(_._2)
      .flatMapGroupsWithState[LtvState, LtvCell](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long, Option[Double], java.sql.Timestamp)],
         state: GroupState[LtvState]) =>
          if (state.hasTimedOut) {
            state.remove() // re-entry: the next event pins a fresh cohort
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._3, r._1))
            val maxTs = sorted.iterator.map(_._5.getTime).foldLeft(Long.MinValue)(math.max)
            val (st, cells) = foldSorted(
              sorted.iterator.map(r => LEvent(r._1, r._2, r._3, r._4)),
              state.getOption.getOrElse(EmptyState))
            state.update(st)
            if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + retentionMs)
            cells.iterator
          }
      }
  }

  /** Streaming form behind a memory sink (one AvailableNow pass). */
  def cellsStreaming(spark: SparkSession, sourceDir: String,
                     revenueType: String = "purchase",
                     watermark: String = "2 hours",
                     retentionMs: Long = 90L * 24 * 3600 * 1000,
                     queryName: String = "ltv_cells",
                     schema: Option[StructType] = None): DataFrame = {
    val q = cellStream(spark, sourceDir, revenueType, watermark, retentionMs, schema)
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Fold emitted cells into the batch operator's output frame — the same
    * DECIMAL(18,2) per-event casts, cohort-size window and cumulative
    * divide as [[graft.operators.EventAnalytics.cohortLtv]], over the cell
    * frame only (rows = cohorts x offsets after the first aggregate).
    * Output == cohortLtv row-for-row. */
  def aggregateCells(cells: DataFrame): DataFrame = {
    val perCell = cells.groupBy("cohort_week", "week_offset")
      .agg(
        count(when(col("first_active"), lit(1))).as("n_active"),
        coalesce(sum(expr("CAST(rev AS DECIMAL(18,2))")),
          expr("CAST(0 AS DECIMAL(18,2))")).as("__rev_dec"))
    val wc = Window.partitionBy("cohort_week")
    val wcum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perCell
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(wc))
      .withColumn("__cum", sum(col("__rev_dec")).over(wcum))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        col("__rev_dec").cast("double").as("week_revenue"),
        (col("__cum").cast("double") / col("cohort_size")).as("ltv_per_user"))
  }
}
