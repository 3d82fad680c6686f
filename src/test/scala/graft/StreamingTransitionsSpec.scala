package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAnalytics
import graft.sources.Tables
import graft.streaming.StreamingTransitions
import graft.streaming.StreamingTransitions.Transition

/** Streaming transitions parity: the previous-event fold must aggregate to
  * the batch lead-window matrix exactly, and the stream must equal the
  * batch replay. */
class StreamingTransitionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  private def summarize(rows: Seq[Transition]): Map[(String, String), (Long, Long)] =
    rows.groupBy(r => (r.src_type, r.dst_type)).map { case (k, rs) =>
      k -> ((rs.size.toLong, rs.map(_.user_id).distinct.size.toLong))
    }

  test("fold replay aggregates to the lead-window matrix, gap and tie edges") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 01:00:00"), "click"),
      (3L, 1L, ts("2024-01-01 01:30:00"), "purchase"),
      (4L, 1L, ts("2024-01-02 02:30:00"), "error"), // +25h: dropped
      (5L, 2L, ts("2024-01-01 00:00:00"), "view"),
      (6L, 2L, ts("2024-01-01 00:10:00"), "view"),
      (7L, 2L, ts("2024-01-01 00:20:00"), "click"),
      (8L, 3L, ts("2024-01-01 00:00:00"), "click"), // same ts: id order
      (9L, 3L, ts("2024-01-01 00:00:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = summarize(StreamingTransitions.transitionsBatch(events).collect().toSeq)
    assert(got === Map(
      ("view", "click") -> ((2L, 2L)),
      ("click", "purchase") -> ((1L, 1L)),
      ("view", "view") -> ((1L, 1L)),
      ("click", "view") -> ((1L, 1L))))
    val win = EventAnalytics.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === win)
  }

  test("fold replay aggregates to the lead-window matrix on the events table") {
    val events = Tables.events(spark, SparkTestBase.Sf0001)
    val got = summarize(
      StreamingTransitions.transitionsBatch(events).collect().toSeq)
    val win = EventAnalytics.transitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === win)
    assert(got.values.map(_._1).sum > 0L)
  }

  test("streaming transitions equal the batch replay on the events table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trans_stream").toString
    Tables.events(spark, SparkTestBase.Sf0001).write.mode("overwrite").parquet(dir)
    val batch = StreamingTransitions
      .transitionsBatch(Tables.events(spark, SparkTestBase.Sf0001))
      .collect()
      .map(r => (r.user_id, r.src_type, r.dst_type, r.dst_event_id, r.dst_ts))
      .toSet
    val stream = StreamingTransitions.transitionsStreaming(spark, dir,
        queryName = s"trans_${System.nanoTime()}")
      .as[Transition]
      .collect()
      .map(r => (r.user_id, r.src_type, r.dst_type, r.dst_event_id, r.dst_ts))
      .toSet
    assert(batch.nonEmpty)
    assert(stream === batch,
      s"batch-only: ${(batch -- stream).take(3)}; stream-only: ${(stream -- batch).take(3)}")
  }
}
