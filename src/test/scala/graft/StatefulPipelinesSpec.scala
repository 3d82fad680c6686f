package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, to_timestamp}
import graft.sources.Tables
import graft.streaming.StatefulPipelines
import graft.streaming.StatefulPipelines.{Alert, Event, UserState}

/** flatMapGroupsWithState parity: the streaming state machine must replay
  * the exact same transitions as the batch fold over identical data — and
  * its event-time timeout must actually evict idle keys' state. */
class StatefulPipelinesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("transition function: spend alert fires once, error alert on the 3rd consecutive") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var st = UserState(0L, 0, alertedSpend = false)
    def feed(tpe: String, v: Double): List[Alert] = {
      val (next, alerts) = StatefulPipelines.step(st, Event(0L, 1L, ts, tpe, v))
      st = next; alerts
    }
    assert(feed("click", 499.0).isEmpty)
    assert(feed("click", 1.0).map(_.alert_type) === List("SPEND"))
    assert(feed("click", 1000.0).isEmpty) // spend alert is once-only
    assert(feed("error", 0.0).isEmpty)
    assert(feed("error", 0.0).isEmpty)
    assert(feed("error", 0.0).map(_.alert_type) === List("ERRORS"))
    assert(feed("error", 0.0).isEmpty) // 4th error: counter already past the edge
    assert(feed("view", 0.0).isEmpty)  // reset
    assert(st.consecutiveErrors === 0)
  }

  test("spend accumulates in exact cents (no float drift at the threshold)") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 0.1 + 0.2 style drift: 4999 events of 0.10 then one of 0.10 == 500.00
    var st = UserState(49990L, 0, alertedSpend = false)
    val (next, alerts) = StatefulPipelines.step(st, Event(0L, 1L, ts, "click", 0.10))
    assert(next.spendCents === 50000L)
    assert(alerts.map(_.alert_type) === List("SPEND"))
    assert(alerts.head.spend === 500.0)
  }

  test("cents rounding matches DuckDB DECIMAL cast: ties away from zero") {
    // DuckDB's CAST(x AS DECIMAL(18,2)) rounds half away from zero on the
    // exact binary value. -2.125 is exactly representable; math.round would
    // give -212 (toward +inf) and silently desync the fold from the oracle.
    assert(StatefulPipelines.toCents(2.125) === 213L)
    assert(StatefulPipelines.toCents(-2.125) === -213L)
    assert(StatefulPipelines.toCents(-0.005) === -1L)
    assert(StatefulPipelines.toCents(0.1) === 10L)
    // 2.675 is NOT representable (stored as 2.67499999...), so it rounds
    // DOWN on both engines — the exact-binary-value semantics
    assert(StatefulPipelines.toCents(2.675) === 267L)
    // corrupt rows contribute 0 cents instead of killing the stream
    assert(StatefulPipelines.toCents(Double.NaN) === 0L)
    assert(StatefulPipelines.toCents(Double.PositiveInfinity) === 0L)
    assert(StatefulPipelines.toCents(Double.NegativeInfinity) === 0L)
    assert(StatefulPipelines.toCents(1.0e17) === 0L)
  }

  test("streaming state machine equals the batch replay on the events table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_state").toString
    Tables.events(spark, SparkTestBase.Sf0001).write.mode("overwrite").parquet(dir)
    val batch = StatefulPipelines.alertsBatch(Tables.events(spark, SparkTestBase.Sf0001))
      .collect().map(a => (a.user_id, a.ts, a.alert_type, math.round(a.spend * 100), a.consecutive_errors)).toSet
    val stream = StatefulPipelines.alertsStreaming(spark, dir,
      queryName = s"alerts_${System.nanoTime()}")
      .as[Alert]
      .collect().map(a => (a.user_id, a.ts, a.alert_type, math.round(a.spend * 100), a.consecutive_errors)).toSet
    assert(batch.nonEmpty, "expected some alerts from the fixture data")
    assert(stream === batch,
      s"batch-only: ${(batch -- stream).take(3)}; stream-only: ${(stream -- batch).take(3)}")
  }

  test("checkpoint recovery: state survives a restart with no duplicate or lost alerts") {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_recovery").toString
    val src = s"$base/src"
    val ckpt = s"$base/ckpt"
    val sink = s"$base/out"
    def write(rows: Seq[(Long, Long, String, String, Double)]): Unit =
      rows.toDF("event_id", "user_id", "ts_s", "event_type", "value")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("ts_s")).as("ts"), col("event_type"), col("value"))
        .write.mode(SaveMode.Append).parquet(src)
    def run(): Unit = {
      val q = StatefulPipelines.alertsStream(spark, src)
        .toDF().writeStream
        .outputMode(OutputMode.Append())
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1 — each user's state is deliberately mid-flight at shutdown:
    //  user 1: 300.00 spent (below the 500 threshold — alert pending)
    //  user 2: 600.00 spent (SPEND alert fires HERE; must not refire later)
    //  user 3: 2 consecutive errors (one short of the ERRORS alert)
    write(Seq(
      (0L, 1L, "2024-01-01 00:00:00", "click", 300.0),
      (1L, 2L, "2024-01-01 00:10:00", "click", 600.0),
      (2L, 3L, "2024-01-01 00:20:00", "error", 0.0),
      (3L, 3L, "2024-01-01 00:30:00", "error", 0.0)))
    run()
    val afterFirst = spark.read.parquet(sink).as[Alert].collect()
    assert(afterFirst.map(_.alert_type).toSeq === Seq("SPEND"), "only user 2 alerts in batch 1")

    // restart from the checkpoint with batch 2 appended:
    //  user 1 crosses 500 ONLY IF the 300.00 survived the restart (loss check)
    //  user 2 spends more — a second SPEND alert would mean state was lost
    //    and alertedSpend reset (duplicate check)
    //  user 3's third error alerts ONLY IF the counter survived
    write(Seq(
      (4L, 1L, "2024-01-01 01:00:00", "click", 250.0),
      (5L, 2L, "2024-01-01 01:10:00", "click", 700.0),
      (6L, 3L, "2024-01-01 01:20:00", "error", 0.0)))
    run()

    // MULTISET comparison against the batch replay of the full event log:
    // a duplicated alert (same values twice) would pass a set compare
    def canon(as: Seq[Alert]): Seq[(Long, Long, String, Long, Int)] =
      as.map(a => (a.user_id, a.ts.getTime, a.alert_type,
        math.round(a.spend * 100), a.consecutive_errors)).sorted
    val streamed = canon(spark.read.parquet(sink).as[Alert].collect().toSeq)
    val replayed = canon(StatefulPipelines.alertsBatch(
      spark.read.parquet(src)).collect().toSeq)
    assert(replayed.map(_._3).sorted === Seq("ERRORS", "SPEND", "SPEND"))
    assert(streamed === replayed,
      s"streamed=$streamed replayed=$replayed — state did not survive the restart intact")
  }

  test("event-time timeout evicts an idle key's state (hasTimedOut path executes)") {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val base = java.nio.file.Files.createTempDirectory("graft_evict").toString
    val src = s"$base/src"
    val ckpt = s"$base/ckpt"
    val sink = s"$base/out"
    def write(rows: Seq[(Long, Long, String, String, Double)]): Unit =
      rows.toDF("event_id", "user_id", "ts_s", "event_type", "value")
        .select(col("event_id"), col("user_id"),
          to_timestamp(col("ts_s")).as("ts"), col("event_type"), col("value"))
        .write.mode(SaveMode.Append).parquet(src)
    // file sink so the query can restart from the checkpoint between batches
    def run(): Unit = {
      val q = StatefulPipelines.alertsStream(spark, src,
          watermark = "1 hour", retentionMs = 2L * 3600 * 1000,
          emitEvictionMarkers = true)
        .toDF().writeStream
        .outputMode(OutputMode.Append())
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // batch 1: users 1 and 2 both active around midnight Jan 1
    write(Seq((0L, 1L, "2024-01-01 00:00:00", "click", 1.0),
              (1L, 2L, "2024-01-01 00:30:00", "click", 1.0)))
    run()
    // batch 2: only user 2 returns a day later -> watermark will advance
    write(Seq((2L, 2L, "2024-01-02 00:00:00", "click", 1.0)))
    run()
    // batch 3: user 2 again; during this batch the watermark (Jan 1 23:00)
    // is past user 1's timeout (Jan 1 02:00) -> user 1's state evicts
    write(Seq((3L, 2L, "2024-01-02 02:00:00", "click", 1.0)))
    run()
    val all = spark.read.parquet(sink).as[Alert].collect()

    val evicted = all.filter(_.alert_type == "EVICT").map(_.user_id).toSet
    assert(evicted.contains(1L), s"expected user 1's idle state evicted, got: ${all.mkString(", ")}")
    assert(!evicted.contains(2L), "active user 2 must keep its state")
  }
}
