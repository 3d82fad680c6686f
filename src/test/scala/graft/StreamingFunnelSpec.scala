package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, to_timestamp}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.operators.EventAnalytics
import graft.sources.Tables
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.Reach

/** Streaming funnel parity: the stateful fold must reproduce the
  * window-form funnel exactly (including same-instant tie semantics), the
  * stream must equal the batch replay, and the event-time timeout must
  * evict state observably (re-entry re-emits step 1). */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("fold replay equals the window-form funnel, including tie edges") {
    // the EventAnalyticsSpec edge corpus, plus event_ids ADVERSE to the
    // tie: u5's purchase has a SMALLER event_id than its same-instant
    // click — only the step-index sort keeps the fold equal to the
    // window form's ts >= s1 semantics
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 01:00:00"), "click"),
      (3L, 1L, ts("2024-01-01 02:00:00"), "purchase"),
      (4L, 2L, ts("2024-01-01 00:00:00"), "click"),
      (5L, 2L, ts("2024-01-01 01:00:00"), "view"),
      (6L, 3L, ts("2024-01-01 00:00:00"), "view"),
      (7L, 3L, ts("2024-01-01 01:00:00"), "click"),
      (8L, 3L, ts("2024-01-02 06:00:00"), "purchase"),
      (9L, 4L, ts("2024-01-01 00:00:00"), "click"),
      (11L, 5L, ts("2024-01-01 00:00:00"), "click"), // same instant as view,
      (12L, 5L, ts("2024-01-01 00:00:00"), "view"),  //   smaller event_id
      (10L, 5L, ts("2024-01-02 00:00:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val reaches = StreamingFunnel.reachBatch(events, steps).collect()
    // exact per-user reach rows for the edge users
    assert(reaches.filter(_.user_id == 2L).map(_.step).toSeq === Seq(1))
    assert(reaches.filter(_.user_id == 5L).map(_.step).sorted === Seq(1, 2, 3))
    // distinct users per step == the window-form n_users, bit for bit
    val foldCounts = reaches.groupBy(_.step)
      .map { case (s, rs) => (s.toLong, rs.map(_.user_id).distinct.length.toLong) }
    val windowCounts = EventAnalytics.funnel(events, steps).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(foldCounts === windowCounts)
  }

  test("fold replay equals the window-form funnel on the events table") {
    val events = Tables.events(spark, SparkTestBase.Sf0001)
    val foldCounts = StreamingFunnel.reachBatch(events, steps).collect()
      .groupBy(_.step)
      .map { case (s, rs) => (s.toLong, rs.map(_.user_id).distinct.length.toLong) }
    val windowCounts = EventAnalytics.funnel(events, steps).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(foldCounts === windowCounts)
    assert(foldCounts(1L) > 0L)
  }

  test("streaming reaches equal the batch replay on the events table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_stream").toString
    Tables.events(spark, SparkTestBase.Sf0001).write.mode("overwrite").parquet(dir)
    val batch = StreamingFunnel
      .reachBatch(Tables.events(spark, SparkTestBase.Sf0001), steps)
      .collect().map(r => (r.user_id, r.step, r.step_name, r.reach_ts)).toSet
    val stream = StreamingFunnel.reachStreaming(spark, dir, steps,
        queryName = s"funnel_${System.nanoTime()}")
      .as[Reach]
      .collect().map(r => (r.user_id, r.step, r.step_name, r.reach_ts)).toSet
    assert(batch.nonEmpty)
    assert(stream === batch,
      s"batch-only: ${(batch -- stream).take(3)}; stream-only: ${(stream -- batch).take(3)}")
  }

  test("event-time timeout evicts funnel state: a returning user re-enters") {
    val base = java.nio.file.Files.createTempDirectory("graft_funnel_evict").toString
    val src = s"$base/src"
    def write(rows: Seq[(Long, Long, String, String)]): Unit =
      rows.toDF("event_id", "user_id", "ts_s", "event_type")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("ts_s")).as("ts"), col("event_type"))
        .write.mode(SaveMode.Append).parquet(src)
    def run(): Unit = {
      val q = StreamingFunnel.reachStream(spark, src, steps,
          watermark = "1 hour", retentionMs = 2L * 3600 * 1000)
        .toDF().writeStream
        .outputMode(OutputMode.Append())
        .format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: both users open funnels around midnight Jan 1
    write(Seq((0L, 1L, "2024-01-01 00:00:00", "view"),
              (1L, 2L, "2024-01-01 00:30:00", "view")))
    run()
    // batch 2: only user 2 stays active -> watermark starts advancing
    write(Seq((2L, 2L, "2024-01-02 00:00:00", "view")))
    run()
    // batch 3: watermark (Jan 1 23:00) passes user 1's timeout (Jan 1
    // 02:00) during this batch -> user 1's state evicts
    write(Seq((3L, 2L, "2024-01-03 00:00:00", "view")))
    run()
    // batch 4: user 1 returns -> FRESH funnel, step 1 re-emits (with
    // retained state this view would be a silent no-op)
    write(Seq((4L, 1L, "2024-01-03 00:30:00", "view")))
    run()
    val reaches = spark.read.parquet(s"$base/out").as[Reach].collect()
    val u1Step1 = reaches.filter(r => r.user_id == 1L && r.step == 1)
    assert(u1Step1.length === 2,
      s"expected eviction + re-entry to emit step 1 twice for user 1: ${reaches.toSeq}")
    assert(reaches.count(r => r.user_id == 2L && r.step == 1) === 1)
  }
}
