package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming rolling-anomaly detection — the stateful counterpart of
 * [[graft.operators.EventAnalytics.rollingAnomaly]], on the same
 * `flatMapGroupsWithState` contract as [[StreamingGapFill]].
 *
 * Emission model: the batch operator's trailing ROWS window is a per-user
 * ring buffer of the last `lookback` cents values; every arriving event is
 * tested against the ring's exact integer statistics
 * ((nx-S)^2 > z^2(nQ-S^2), see the batch scaladoc for the derivation) and
 * then pushed. An anomaly emits IMMEDIATELY — unlike gap-fill there is no
 * open-run ambiguity, so the stream equals the batch replay row-for-row
 * whenever events arrive in event-time order (pinned in the spec; late
 * arrivals inside a micro-batch are re-sorted, late across batches would
 * have entered a window the batch form gives them).
 *
 * NULL parity: the batch window COUNTS a null-value row (count(lit(1)))
 * but skips it in both sums, and never emits for it. The ring mirrors
 * that with a [[NullCents]] sentinel slot — occupying window positions,
 * contributing nothing to S/Q, never testing.
 *
 * STATE & EVICTION: per-user state is `lookback` longs — constant bytes
 * per user. The event-time timeout simply drops idle users' rings
 * (a returning user restarts its warm-up window, the same contract as
 * [[StreamingGapFill]]'s eviction horizon).
 */
object StreamingAnomaly {

  /** Ring slot for a counted-but-valueless event (batch: count(lit(1))
    * includes the row, sum skips it). */
  val NullCents: Long = Long.MinValue

  /** `tsu`: event-time in microseconds (total order matches the batch
    * window's (ts, event_id) sort). */
  case class AEvent(event_id: Long, user_id: Long, tsu: Long, cents: Long)
  case class RingState(ring: List[Long])
  case class AnomalyRow(user_id: Long, event_id: Long, cents: Long,
                        n_prev: Long, dev_sq: Long, var_scaled: Long)

  val EmptyState: RingState = RingState(Nil)

  /** Pure transition: test the event against the trailing ring, then push
    * it (evicting beyond `lookback`). Exact BIGINT arithmetic throughout. */
  private[graft] def step(st: RingState, e: AEvent, lookback: Int,
                          minPrev: Int, zSq: Long): (RingState, Option[AnomalyRow]) = {
    val n = st.ring.size.toLong
    val vals = st.ring.filter(_ != NullCents)
    // vals.nonEmpty mirrors the batch form's NULL window sum (an all-null
    // window makes s_prev NULL there, so the comparison never passes)
    val out = if (n >= minPrev && e.cents != NullCents && vals.nonEmpty) {
      val s = vals.sum
      val q = vals.map(c => c * c).sum
      val dev = n * e.cents - s
      val devSq = dev * dev
      val varScaled = zSq * (n * q - s * s)
      if (devSq > varScaled)
        Some(AnomalyRow(e.user_id, e.event_id, e.cents, n, devSq, varScaled))
      else None
    } else None
    (RingState((st.ring :+ e.cents).takeRight(lookback)), out)
  }

  private def foldSorted(events: Iterator[AEvent], init: RingState,
                         lookback: Int, minPrev: Int,
                         zSq: Long): (RingState, List[AnomalyRow]) = {
    val out = List.newBuilder[AnomalyRow]
    var st = init
    events.foreach { e =>
      val (st2, row) = step(st, e, lookback, minPrev, zSq)
      st = st2
      out ++= row
    }
    (st, out.result())
  }

  /** Shared projection: cents via the DECIMAL(18,2) convention, NULL
    * mapped to the sentinel; `tsu` = microsecond event time. */
  private def project(events: DataFrame, eventType: String, withTs: Boolean): DataFrame =
    events.filter(col("event_type") === eventType)
      .select(Seq(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tsu"),
        coalesce((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(NullCents)).as("cents")) ++
        (if (withTs) Seq(col("ts")) else Nil): _*)

  /** Batch form: replay each user in (tsu, event_id) order — equals
    * [[graft.operators.EventAnalytics.rollingAnomaly]] row-for-row. */
  def rowsBatch(events: DataFrame, eventType: String = "purchase",
                lookback: Int = 10, minPrev: Int = 5,
                zSquared: Long = 4L): Dataset[AnomalyRow] = {
    implicit val rowEnc = Encoders.product[AnomalyRow]
    implicit val evEnc = Encoders.product[AEvent]
    implicit val longEnc = Encoders.scalaLong
    project(events, eventType, withTs = false).as[AEvent]
      .groupByKey(_.user_id)
      .flatMapSortedGroups(col("tsu").asc, col("event_id").asc) { (_, it) =>
        foldSorted(it, EmptyState, lookback, minPrev, zSquared)._2.iterator
      }
  }

  /** The unterminated streaming Dataset (no sink): anomalies emit as their
    * event folds in; the event-time timeout drops idle users' rings. */
  def rowStream(spark: SparkSession, sourceDir: String,
                eventType: String = "purchase",
                lookback: Int = 10, minPrev: Int = 5, zSquared: Long = 4L,
                watermark: String = "2 hours",
                retentionMs: Long = 90L * 24 * 3600 * 1000,
                schema: Option[StructType] = None): Dataset[AnomalyRow] = {
    implicit val rowEnc = Encoders.product[AnomalyRow]
    implicit val stateEnc = Encoders.product[RingState]
    implicit val longEnc = Encoders.scalaLong
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val src = spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
    type Row5 = (Long, Long, Long, Long, java.sql.Timestamp)
    val evs = project(src, eventType, withTs = true)
      .as[Row5](Encoders.product[(Long, Long, Long, Long, java.sql.Timestamp)])
    evs.groupByKey(_._2)
      .flatMapGroupsWithState[RingState, AnomalyRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[Row5], state: GroupState[RingState]) =>
          if (state.hasTimedOut) {
            state.remove() // ring holds nothing emittable — just evict
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._3, r._1))
            val maxTs = sorted.iterator.map(_._5.getTime).foldLeft(Long.MinValue)(math.max)
            val (st, out) = foldSorted(
              sorted.iterator.map(r => AEvent(r._1, r._2, r._3, r._4)),
              state.getOption.getOrElse(EmptyState), lookback, minPrev, zSquared)
            state.update(st)
            if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + retentionMs)
            out.iterator
          }
      }
  }

  /** Streaming form behind a memory sink (one AvailableNow pass). */
  def rowsStreaming(spark: SparkSession, sourceDir: String,
                    eventType: String = "purchase",
                    queryName: String = "anomaly_rows",
                    schema: Option[StructType] = None): DataFrame = {
    val q = rowStream(spark, sourceDir, eventType, schema = schema)
      .toDF().writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
