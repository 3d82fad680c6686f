package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.EventAnalytics
import graft.sources.Tables
import graft.streaming.Scd2Serving
import graft.streaming.Scd2Serving.{KeyState, Reading, VersionRow}

/** Streaming SCD2 == the batch dimension build: closed-version rows must be
  * bit-equal (version counters included, persisted across micro-batches /
  * restarts), and idle-key eviction must finalize the open version. */
class StreamingScd2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("step: run-collapsing, null-safe change detect, version continuity") {
    val r1 = Reading(1L, Some(10L), ts("2024-01-01 00:00:00"), 1L)
    val (s1, none1) = Scd2Serving.step(None, r1)
    assert(none1.isEmpty && s1.version === 1L && s1.attr === Some(10L))
    // same attr: run continues, nothing closes
    val (s2, none2) = Scd2Serving.step(Some(s1),
      Reading(1L, Some(10L), ts("2024-01-02 00:00:00"), 2L))
    assert(none2.isEmpty && (s2 eq s1))
    // change: predecessor closes with [v1.from, change.ts)
    val (s3, closed) = Scd2Serving.step(Some(s2),
      Reading(1L, Some(20L), ts("2024-01-03 00:00:00"), 3L))
    assert(closed === Some(VersionRow(1L, Some(10L), ts("2024-01-01 00:00:00"),
      Some(ts("2024-01-03 00:00:00")), 1L, is_current = false)))
    assert(s3.version === 2L)
    // NULL attr after a value is a change (null-safe, both directions)
    val (s4, closed2) = Scd2Serving.step(Some(s3),
      Reading(1L, None, ts("2024-01-04 00:00:00"), 4L))
    assert(closed2.exists(_.attr === Some(20L)) && s4.attr.isEmpty && s4.version === 3L)
    val (s5, closed3) = Scd2Serving.step(Some(s4),
      Reading(1L, None, ts("2024-01-05 00:00:00"), 5L))
    assert(closed3.isEmpty && (s5 eq s4), "NULL == NULL continues the run")
  }

  test("streamed closed versions equal the batch build's non-current rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2_src").toString
    val events = Tables.events(spark, SparkTestBase.Sf0001)
    events.write.mode("overwrite").parquet(dir)
    def canon(rows: Seq[(Long, Option[Long], Timestamp, Option[Timestamp], Long)]) =
      rows.sortBy(r => (r._1, r._5))
    val batch = canon(EventAnalytics.scd2(
        events.withColumn("tier", floor(col("value") / 100).cast("long")),
        eventType = "purchase", attrCol = "tier")
      .filter(!col("is_current"))
      .select("user_id", "attr", "valid_from", "valid_to", "version")
      .as[(Long, Option[Long], Timestamp, Option[Timestamp], Long)].collect().toSeq)
    val streamed = canon(Scd2Serving.scd2Streaming(spark, dir,
        eventType = "purchase", attr = floor(col("value") / 100),
        queryName = s"scd2_${System.nanoTime()}")
      .select("user_id", "attr", "valid_from", "valid_to", "version")
      .as[(Long, Option[Long], Timestamp, Option[Timestamp], Long)].collect().toSeq)
    assert(batch.nonEmpty, "fixture must close some versions")
    assert(streamed === batch,
      s"batch-only: ${(batch.toSet -- streamed).take(3)}; " +
        s"stream-only: ${(streamed.toSet -- batch).take(3)}")
  }

  test("version counters survive a checkpoint restart across time-sliced batches") {
    val base = java.nio.file.Files.createTempDirectory("graft_scd2_ckpt").toString
    val src = s"$base/src"
    val ckpt = s"$base/ckpt"
    val sink = s"$base/out"
    def write(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.toDF("event_id", "user_id", "ts_s", "tier")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("ts_s")).as("ts"), col("tier"),
          lit("purchase").as("event_type"))
        .write.mode(SaveMode.Append).parquet(src)
    def run(): Unit = {
      val q = Scd2Serving.scd2Stream(spark, src, "purchase", col("tier"))
        .toDF().writeStream
        .outputMode(OutputMode.Append())
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: u1 opens tier 1 then changes to 2 (one closed row emitted);
    // u2 opens tier 5 and stays mid-flight at shutdown
    write(Seq((1L, 1L, "2024-01-01 00:00:00", 1L),
              (2L, 1L, "2024-01-01 01:00:00", 2L),
              (3L, 2L, "2024-01-01 00:30:00", 5L)))
    run()
    // batch 2 (strictly later in time): u1 changes again — its closed row
    // must carry version 2 ONLY IF the counter survived the restart; u2's
    // first change closes version 1 opened in batch 1
    write(Seq((4L, 1L, "2024-01-02 00:00:00", 3L),
              (5L, 2L, "2024-01-02 00:30:00", 6L)))
    run()
    val got = spark.read.parquet(sink)
      .select("user_id", "attr", "version")
      .as[(Long, Option[Long], Long)].collect().sorted.toSeq
    assert(got === Seq((1L, Some(1L), 1L), (1L, Some(2L), 2L), (2L, Some(5L), 1L)))
    // and the whole thing still equals the batch replay of the full log
    val replay = EventAnalytics.scd2(
        spark.read.parquet(src).withColumn("tier", col("tier")),
        eventType = "purchase", attrCol = "tier")
      .filter(!col("is_current"))
      .select("user_id", "attr", "version")
      .as[(Long, Option[Long], Long)].collect().sorted.toSeq
    assert(got === replay)
  }

  test("idle-key eviction finalizes the open version (is_current = true)") {
    val base = java.nio.file.Files.createTempDirectory("graft_scd2_evict").toString
    val src = s"$base/src"
    val ckpt = s"$base/ckpt"
    val sink = s"$base/out"
    def write(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.toDF("event_id", "user_id", "ts_s", "tier")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("ts_s")).as("ts"), col("tier"),
          lit("purchase").as("event_type"))
        .write.mode(SaveMode.Append).parquet(src)
    def run(): Unit = {
      val q = Scd2Serving.scd2Stream(spark, src, "purchase", col("tier"),
          watermark = "1 hour", retentionMs = 2L * 3600 * 1000,
          emitFinalOnTimeout = true)
        .toDF().writeStream
        .outputMode(OutputMode.Append())
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: u1 and u2 open versions around midnight
    write(Seq((1L, 1L, "2024-01-01 00:00:00", 1L),
              (2L, 2L, "2024-01-01 00:30:00", 5L)))
    run()
    // batch 2: only u2 stays active, far enough ahead that the watermark
    // passes u1's (last event + retention) -> u1's open version finalizes
    write(Seq((3L, 2L, "2024-01-02 12:00:00", 5L)))
    run()
    // one more batch so the timeout armed after batch 2's watermark fires
    write(Seq((4L, 2L, "2024-01-03 12:00:00", 5L)))
    run()
    val finals = spark.read.parquet(sink).filter(col("is_current"))
      .select("user_id", "attr", "version")
      .as[(Long, Option[Long], Long)].collect().toSeq
    assert(finals.contains((1L, Some(1L), 1L)),
      s"expected user 1's open version finalized on eviction, got: $finals")
    assert(!finals.exists(_._1 == 2L), "active user 2 must keep its state open")
  }
}
