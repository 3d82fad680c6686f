package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.EventAnalytics
import graft.streaming.{EventPipelines, Scd2Serving, StatefulPipelines}
import graft.streaming.StatefulPipelines.Alert

/** The stateful folds on the RocksDB state store — the provider a 100 TB
  * deployment actually runs (default heap-backed HDFS state is the
  * executor-OOM path once key cardinality grows past the heap; RocksDB
  * spills to local disk). These are the SAME scenarios the default-provider
  * suites pin (StatefulPipelinesSpec / StreamingScd2Spec /
  * EventPipelinesSpec), re-run under
  * `spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider`
  * so the folds' state ENCODERS — case-class GroupState payloads, the
  * serialized MG map, SCD2's version counter — are proven to survive the
  * provider swap: same transitions, same checkpoint-restart recovery, same
  * timeout-driven eviction. Each test also asserts the checkpoint actually
  * contains RocksDB snapshot artifacts (a silently-ignored conf would pass
  * parity on the wrong provider). */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** RocksDB checkpoints upload `<version>.zip` snapshots (and `.changelog`
    * deltas) per state partition; the HDFS-backed provider writes only
    * `<version>.delta`/`.snapshot` files. A `.zip` under state/ is the
    * provider's fingerprint. */
  private def assertRocksDbEngaged(ckpt: String): Unit = {
    val stateDir = new java.io.File(s"$ckpt/state")
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) f.listFiles().iterator.flatMap(walk) else Iterator(f)
    assert(stateDir.isDirectory, s"no state dir under $ckpt")
    assert(walk(stateDir).exists(_.getName.endsWith(".zip")),
      s"no RocksDB snapshot artifacts under $ckpt/state — provider conf ignored?")
  }

  private def rm(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(go); f.delete()
    }
    go(new java.io.File(path))
  }

  test("alerts fold: mid-flight state survives a restart on RocksDB (stream == batch replay)") {
    SparkTestBase.withRocksDbState {
      val base = java.nio.file.Files.createTempDirectory("graft_rocks_alerts").toString
      try {
        val src = s"$base/src"; val ckpt = s"$base/ckpt"; val sink = s"$base/out"
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
        // same mid-flight-at-shutdown scenario as StatefulPipelinesSpec:
        // u1 below the spend threshold, u2 already alerted, u3 one error
        // short — every continuation depends on deserialized RocksDB state
        write(Seq(
          (0L, 1L, "2024-01-01 00:00:00", "click", 300.0),
          (1L, 2L, "2024-01-01 00:10:00", "click", 600.0),
          (2L, 3L, "2024-01-01 00:20:00", "error", 0.0),
          (3L, 3L, "2024-01-01 00:30:00", "error", 0.0)))
        run()
        write(Seq(
          (4L, 1L, "2024-01-01 01:00:00", "click", 250.0),
          (5L, 2L, "2024-01-01 01:10:00", "click", 700.0),
          (6L, 3L, "2024-01-01 01:20:00", "error", 0.0)))
        run()
        assertRocksDbEngaged(ckpt)
        def canon(as: Seq[Alert]): Seq[(Long, Long, String, Long, Int)] =
          as.map(a => (a.user_id, a.ts.getTime, a.alert_type,
            math.round(a.spend * 100), a.consecutive_errors)).sorted
        val streamed = canon(spark.read.parquet(sink).as[Alert].collect().toSeq)
        val replayed = canon(StatefulPipelines.alertsBatch(
          spark.read.parquet(src)).collect().toSeq)
        assert(replayed.map(_._3).sorted === Seq("ERRORS", "SPEND", "SPEND"))
        assert(streamed === replayed,
          s"streamed=$streamed replayed=$replayed — state lost across the RocksDB restart")
      } finally rm(base)
    }
  }

  test("SCD2 fold: version counters survive a RocksDB restart; eviction finalizes") {
    SparkTestBase.withRocksDbState {
      val base = java.nio.file.Files.createTempDirectory("graft_rocks_scd2").toString
      try {
        def write(src: String, rows: Seq[(Long, Long, String, Long)]): Unit =
          rows.toDF("event_id", "user_id", "ts_s", "tier")
            .select(col("event_id"), col("user_id"),
              to_timestamp(col("ts_s")).as("ts"), col("tier"),
              lit("purchase").as("event_type"))
            .write.mode(SaveMode.Append).parquet(src)

        // restart leg — the StreamingScd2Spec scenario
        val src1 = s"$base/src1"; val ckpt1 = s"$base/ckpt1"; val sink1 = s"$base/out1"
        def run1(): Unit = {
          val q = Scd2Serving.scd2Stream(spark, src1, "purchase", col("tier"))
            .toDF().writeStream.outputMode(OutputMode.Append())
            .format("parquet").option("path", sink1)
            .option("checkpointLocation", ckpt1)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        write(src1, Seq((1L, 1L, "2024-01-01 00:00:00", 1L),
                        (2L, 1L, "2024-01-01 01:00:00", 2L),
                        (3L, 2L, "2024-01-01 00:30:00", 5L)))
        run1()
        write(src1, Seq((4L, 1L, "2024-01-02 00:00:00", 3L),
                        (5L, 2L, "2024-01-02 00:30:00", 6L)))
        run1()
        assertRocksDbEngaged(ckpt1)
        val got = spark.read.parquet(sink1)
          .select("user_id", "attr", "version")
          .as[(Long, Option[Long], Long)].collect().sorted.toSeq
        assert(got === Seq((1L, Some(1L), 1L), (1L, Some(2L), 2L), (2L, Some(5L), 1L)))
        val replay = EventAnalytics.scd2(
            spark.read.parquet(src1), eventType = "purchase", attrCol = "tier")
          .filter(!col("is_current"))
          .select("user_id", "attr", "version")
          .as[(Long, Option[Long], Long)].collect().sorted.toSeq
        assert(got === replay)

        // finalize-on-eviction leg: the event-time timeout must fire from
        // RocksDB-resident state exactly as from heap state
        val src2 = s"$base/src2"; val ckpt2 = s"$base/ckpt2"; val sink2 = s"$base/out2"
        def run2(): Unit = {
          val q = Scd2Serving.scd2Stream(spark, src2, "purchase", col("tier"),
              watermark = "1 hour", retentionMs = 2L * 3600 * 1000,
              emitFinalOnTimeout = true)
            .toDF().writeStream.outputMode(OutputMode.Append())
            .format("parquet").option("path", sink2)
            .option("checkpointLocation", ckpt2)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        write(src2, Seq((1L, 1L, "2024-01-01 00:00:00", 1L),
                        (2L, 2L, "2024-01-01 00:30:00", 5L)))
        run2()
        write(src2, Seq((3L, 2L, "2024-01-02 12:00:00", 5L)))
        run2()
        write(src2, Seq((4L, 2L, "2024-01-03 12:00:00", 5L)))
        run2()
        val finals = spark.read.parquet(sink2).filter(col("is_current"))
          .select("user_id", "attr", "version")
          .as[(Long, Option[Long], Long)].collect().toSeq
        assert(finals.contains((1L, Some(1L), 1L)),
          s"expected user 1's open version finalized on RocksDB eviction, got: $finals")
        assert(!finals.exists(_._1 == 2L), "active user 2 must keep its state open")
      } finally rm(base)
    }
  }

  test("funnel and attribution folds: stream == batch under RocksDB") {
    SparkTestBase.withRocksDbState {
      val dir = java.nio.file.Files.createTempDirectory("graft_rocks_fa").toString
      try {
        graft.sources.Tables.events(spark, SparkTestBase.Sf0001)
          .write.mode("overwrite").parquet(dir)
        val ev = graft.sources.Tables.events(spark, SparkTestBase.Sf0001)
        val steps = Seq("view", "click", "purchase")
        // funnel: array-of-timestamps GroupState payload
        val fBatch = graft.streaming.StreamingFunnel.reachBatch(ev, steps)
          .collect().map(r => (r.user_id, r.step, r.step_name, r.reach_ts)).toSet
        val fStream = graft.streaming.StreamingFunnel
          .reachStreaming(spark, dir, steps,
            queryName = s"rocks_funnel_${System.nanoTime()}")
          .as[graft.streaming.StreamingFunnel.Reach]
          .collect().map(r => (r.user_id, r.step, r.step_name, r.reach_ts)).toSet
        assert(fBatch.nonEmpty && fStream === fBatch,
          s"funnel fold diverged on RocksDB: batch-only ${(fBatch -- fStream).take(3)}")
        // attribution: option-of-touch-pair GroupState payload
        val aBatch = graft.streaming.StreamingAttribution.attributedBatch(ev)
          .collect().map(r => (r.user_id, r.event_id, r.conv_ts, r.channel, r.value)).toSet
        val aStream = graft.streaming.StreamingAttribution
          .attributedStreaming(spark, dir,
            queryName = s"rocks_attr_${System.nanoTime()}")
          .as[graft.streaming.StreamingAttribution.Attributed]
          .collect().map(r => (r.user_id, r.event_id, r.conv_ts, r.channel, r.value)).toSet
        assert(aBatch.nonEmpty && aStream === aBatch,
          s"attribution fold diverged on RocksDB: batch-only ${(aBatch -- aStream).take(3)}")
      } finally rm(dir)
    }
  }

  /** Canonical row images for a stream-vs-batch set compare: both sides
    * emit the same case class, so column order and toString agree. */
  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("anomaly, gap-fill and transitions folds: stream == batch under RocksDB") {
    // the remaining ROW-granularity GroupState encoder shapes: the ring
    // buffer (RingState), the run anchor (RunState) and the prev-event
    // option (PrevState) — encoder shape is exactly what the funnel/
    // attribution extension showed needs per-shape proof
    SparkTestBase.withRocksDbState {
      val dir = java.nio.file.Files.createTempDirectory("graft_rocks_agt").toString
      try {
        graft.sources.Tables.events(spark, SparkTestBase.Sf0001)
          .write.mode("overwrite").parquet(dir)
        val ev = graft.sources.Tables.events(spark, SparkTestBase.Sf0001)
        val n = System.nanoTime()
        val aB = rowSet(graft.streaming.StreamingAnomaly.rowsBatch(ev).toDF())
        val aS = rowSet(graft.streaming.StreamingAnomaly.rowsStreaming(
          spark, dir, queryName = s"rocks_anom_$n"))
        assert(aB.nonEmpty && aS === aB,
          s"anomaly fold diverged on RocksDB: batch-only ${(aB -- aS).take(3)}")
        // gap-fill holds each user's final open anchor in state until the
        // event-time timeout (the closed-run contract StreamingCohortsSpec
        // pins on the default provider) — same bound must hold on RocksDB
        def gKey(r: graft.streaming.StreamingGapFill.GapRow) =
          (r.user_id, r.day, r.day_value, r.filled_value, r.is_gap)
        val gBatchRows = graft.streaming.StreamingGapFill.rowsBatch(ev).collect()
        val gB = gBatchRows.map(gKey).toSet
        val gS = graft.streaming.StreamingGapFill.rowsStreaming(
            spark, dir, queryName = s"rocks_gap_$n")
          .as[graft.streaming.StreamingGapFill.GapRow].collect().map(gKey).toSet
        val gTails = gBatchRows.groupBy(_.user_id).values
          .map(rs => gKey(rs.maxBy(_.day))).toSet
        assert(gB.nonEmpty && (gS -- gB).isEmpty,
          s"gap-fill stream-only rows on RocksDB: ${(gS -- gB).take(3)}")
        assert((gB -- gS).subsetOf(gTails),
          s"gap-fill missing non-tail rows on RocksDB: ${(gB -- gS -- gTails).take(3)}")
        val tB = rowSet(graft.streaming.StreamingTransitions.transitionsBatch(ev).toDF())
        val tS = rowSet(graft.streaming.StreamingTransitions.transitionsStreaming(
          spark, dir, queryName = s"rocks_trans_$n"))
        assert(tB.nonEmpty && tS === tB,
          s"transitions fold diverged on RocksDB: batch-only ${(tB -- tS).take(3)}")
      } finally rm(dir)
    }
  }

  test("growth, LTV and retention folds: stream == batch under RocksDB") {
    // the CELL-granularity shapes: week-set membership (GrowthState),
    // offset-set + revenue lattice (LtvState), cohort + seen-offsets
    // (RetentionState)
    SparkTestBase.withRocksDbState {
      val dir = java.nio.file.Files.createTempDirectory("graft_rocks_glr").toString
      try {
        graft.sources.Tables.events(spark, SparkTestBase.Sf0001)
          .write.mode("overwrite").parquet(dir)
        val ev = graft.sources.Tables.events(spark, SparkTestBase.Sf0001)
        val n = System.nanoTime()
        val gB = rowSet(graft.streaming.StreamingGrowth.cellsBatch(ev).toDF())
        val gS = rowSet(graft.streaming.StreamingGrowth.cellsStreaming(
          spark, dir, queryName = s"rocks_growth_$n"))
        assert(gB.nonEmpty && gS === gB,
          s"growth fold diverged on RocksDB: batch-only ${(gB -- gS).take(3)}")
        val lB = rowSet(graft.streaming.StreamingLtv.cellsBatch(ev).toDF())
        val lS = rowSet(graft.streaming.StreamingLtv.cellsStreaming(
          spark, dir, queryName = s"rocks_ltv_$n"))
        assert(lB.nonEmpty && lS === lB,
          s"LTV fold diverged on RocksDB: batch-only ${(lB -- lS).take(3)}")
        val rB = rowSet(graft.streaming.StreamingRetention.cellsBatch(ev).toDF())
        val rS = rowSet(graft.streaming.StreamingRetention.cellsStreaming(
          spark, dir, queryName = s"rocks_ret_$n"))
        assert(rB.nonEmpty && rS === rB,
          s"retention fold diverged on RocksDB: batch-only ${(rB -- rS).take(3)}")
      } finally rm(dir)
    }
  }

  test("heavy-hitter census: serialized MG state survives a RocksDB restart") {
    SparkTestBase.withRocksDbState {
      val base = java.nio.file.Files.createTempDirectory("graft_rocks_hh").toString
      try {
        val src = s"$base/src"; val ckpt = s"$base/ckpt"; val sink = s"$base/out"
        def write(rows: Seq[(Long, Long, String)]): Unit =
          rows.toDF("event_id", "user_id", "ts_s")
            .select(col("event_id"), col("user_id"),
              to_timestamp(col("ts_s")).as("ts"), lit("typeA").as("event_type"),
              lit(1.0).as("value"))
            .write.mode(SaveMode.Append).parquet(src)
        def run(): Unit = {
          val q = EventPipelines.heavyUsersStream(spark, src, "1 hour", "1 hour", k = 8)
            .writeStream.outputMode(OutputMode.Append())
            .format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        // same scenario as EventPipelinesSpec: hour-2's PARTIAL summary
        // stays behind in (RocksDB) state across the restart
        write(Seq((0L, 10L, "2024-01-01 00:10:00"), (1L, 10L, "2024-01-01 00:20:00"),
                  (2L, 11L, "2024-01-01 00:40:00"), (3L, 20L, "2024-01-01 02:10:00")))
        run()
        write(Seq((4L, 20L, "2024-01-01 02:20:00"), (5L, 21L, "2024-01-01 02:30:00"),
                  (6L, 55L, "2024-01-01 00:50:00"), (7L, 99L, "2024-01-01 05:00:00")))
        run()
        assertRocksDbEngaged(ckpt)
        val got = spark.read.parquet(sink)
          .select("window_start", "frequent_users", "n_events")
          .as[(Timestamp, Seq[(String, Long)], Long)].collect()
          .sortBy(_._1.getTime)
        def t(s: String) = Timestamp.valueOf(s)
        assert(got.map(_._1).toSeq === Seq(t("2024-01-01 00:00:00"), t("2024-01-01 02:00:00")),
          s"expected exactly hour-0 and hour-2 windows once each: ${got.mkString(", ")}")
        assert(got(0)._2 === Seq("10" -> 2L, "11" -> 1L) && got(0)._3 === 3L,
          s"hour-0 summary wrong (late row must not reopen it): ${got(0)}")
        assert(got(1)._2 === Seq("20" -> 2L, "21" -> 1L) && got(1)._3 === 3L,
          s"hour-2 summary lost the pre-restart partial: ${got(1)}")
      } finally rm(base)
    }
  }
}
