package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, to_timestamp}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.operators.EventAnalytics
import graft.sources.Tables
import graft.streaming.StreamingAttribution
import graft.streaming.StreamingAttribution.Attributed

/** Streaming attribution parity: the per-conversion fold must aggregate to
  * the batch window operator's channel summary exactly, the stream must
  * equal the batch replay, and eviction at the window horizon must be
  * lossless (a post-window conversion is (direct) either way). */
class StreamingAttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  /** Channel summary from emitted rows, replaying the batch operator's
    * exact-money convention (DECIMAL(18,2) sum as double). */
  private def summarize(rows: Seq[Attributed]): Map[String, (Long, Long, Double)] =
    rows.groupBy(_.channel).map { case (ch, rs) =>
      val cents = rs.flatMap(_.value)
        .map(v => BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      ch -> ((rs.size.toLong, rs.map(_.user_id).distinct.size.toLong,
        cents.sum.toDouble))
    }

  test("fold replay aggregates to the window-form attribution, tie edges included") {
    // the EventAnalyticsSpec edge corpus: same-ts touch ids on both sides
    // of the conversion, the 72h deadline, no-touch users
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "view", Some(0.0)),
      (2L, 1L, ts("2024-01-01 01:00:00"), "click", Some(0.0)),
      (3L, 1L, ts("2024-01-01 02:00:00"), "purchase", Some(10.0)),
      (4L, 1L, ts("2024-01-01 05:00:00"), "purchase", Some(5.5)),
      (5L, 2L, ts("2024-01-01 00:00:00"), "purchase", Some(3.0)),
      (6L, 3L, ts("2024-01-01 00:00:00"), "view", Some(0.0)),
      (7L, 3L, ts("2024-01-04 12:00:00"), "purchase", Some(2.0)),
      (8L, 4L, ts("2024-01-01 00:00:00"), "view", Some(0.0)),
      (9L, 4L, ts("2024-01-01 00:00:00"), "click", Some(0.0)),
      (10L, 4L, ts("2024-01-01 00:30:00"), "purchase", Some(1.0)),
      (11L, 5L, ts("2024-01-01 00:00:00"), "view", Some(0.0)),
      (12L, 5L, ts("2024-01-01 00:00:00"), "purchase", Some(4.0))
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = summarize(StreamingAttribution.attributedBatch(events).collect().toSeq)
    assert(got === Map(
      "click" -> ((3L, 2L, 16.5)),
      "view" -> ((1L, 1L, 4.0)),
      "(direct)" -> ((2L, 2L, 5.0))))
    // and the batch window operator agrees bit for bit
    val win = EventAnalytics.attribution(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === win)
  }

  test("fold replay aggregates to the window-form attribution on the events table") {
    val events = Tables.events(spark, SparkTestBase.Sf0001)
    val got = summarize(
      StreamingAttribution.attributedBatch(events).collect().toSeq)
    val win = EventAnalytics.attribution(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === win)
    assert(got.values.map(_._1).sum > 0L)
  }

  test("streaming attributed rows equal the batch replay on the events table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_attr_stream").toString
    Tables.events(spark, SparkTestBase.Sf0001).write.mode("overwrite").parquet(dir)
    val batch = StreamingAttribution
      .attributedBatch(Tables.events(spark, SparkTestBase.Sf0001))
      .collect().map(r => (r.user_id, r.event_id, r.conv_ts, r.channel, r.value))
      .toSet
    val stream = StreamingAttribution.attributedStreaming(spark, dir,
        queryName = s"attr_${System.nanoTime()}")
      .as[Attributed]
      .collect().map(r => (r.user_id, r.event_id, r.conv_ts, r.channel, r.value))
      .toSet
    assert(batch.nonEmpty)
    assert(stream === batch,
      s"batch-only: ${(batch -- stream).take(3)}; stream-only: ${(stream -- batch).take(3)}")
  }

  test("window-horizon eviction is lossless: post-window conversion is (direct)") {
    val base = java.nio.file.Files.createTempDirectory("graft_attr_evict").toString
    val src = s"$base/src"
    def write(rows: Seq[(Long, Long, String, String, Option[Double])]): Unit =
      rows.toDF("event_id", "user_id", "ts_s", "event_type", "value")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("ts_s")).as("ts"), col("event_type"), col("value"))
        .write.mode(SaveMode.Append).parquet(src)
    def run(windowHours: Int): Unit = {
      val q = StreamingAttribution.attributedStream(spark, src,
          windowHours = windowHours, watermark = "1 hour")
        .toDF().writeStream
        .outputMode(OutputMode.Append())
        .format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // 2h window: u1 touches, then another user's later events push the
    // watermark (Jan 1 23:00) past u1's timeout (touch + 2h = 02:00) ->
    // u1's state evicts; u1's conversion 25h after the touch (ahead of
    // the watermark, so not late-dropped) must read (direct) — EXACTLY
    // what the batch window form says for a past-deadline touch
    write(Seq((0L, 1L, "2024-01-01 00:00:00", "click", Some(0.0)),
              (1L, 2L, "2024-01-01 00:00:00", "view", Some(0.0))))
    run(2)
    write(Seq((2L, 2L, "2024-01-02 00:00:00", "view", Some(0.0))))
    run(2)
    write(Seq((3L, 1L, "2024-01-02 01:00:00", "purchase", Some(7.0))))
    run(2)
    val out = spark.read.parquet(s"$base/out").as[Attributed].collect()
    val u1 = out.filter(_.user_id == 1L)
    assert(u1.map(r => (r.event_id, r.channel)).toSet === Set((3L, "(direct)")))
  }
}
