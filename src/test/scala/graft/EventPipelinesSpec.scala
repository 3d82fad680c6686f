package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventPipelines

/** Batch/streaming agreement for the events surface (SURVEY.md §2.9):
  * the SAME aggregation must produce the SAME result whether run as a batch
  * plan or as an incremental watermarked stream over the identical data. */
class EventPipelinesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** events (ns-truncated to µs) re-written to a plain parquet dir so the
    * streaming reader sees a directly-loadable schema. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events").toString
    Tables.events(spark, SparkTestBase.Sf0001).write.mode("overwrite").parquet(dir)
    dir
  }

  test("tumbling aggregation: streaming equals batch") {
    val batch = EventPipelines.tumblingBatch(Tables.events(spark, SparkTestBase.Sf0001), "1 hour")
      .select("window_start", "event_type", "n_events", "sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val stream = EventPipelines.tumblingStreaming(spark, eventsDir, "1 hour", "2 hours",
      queryName = s"tumbling_${System.nanoTime()}")
      .select("window_start", "event_type", "n_events", "sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(stream === batch)
  }

  test("sessionization: session_window stream agrees with the lag/cumsum batch form") {
    val gapMin = 30
    val batch = EventPipelines.sessionizeBatch(Tables.events(spark, SparkTestBase.Sf0001), gapMin)
      .select(col("user_id"), col("session_start"), col("n_events"), col("sum_value"))
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
    val stream = EventPipelines.sessionizeStreaming(spark, eventsDir, s"$gapMin minutes", "2 hours",
      queryName = s"sessions_${System.nanoTime()}")
      .select(col("user_id"), col("session_start"), col("n_events"), col("sum_value"))
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
    assert(stream === batch,
      s"batch-only: ${(batch -- stream).take(3)}; stream-only: ${(stream -- batch).take(3)}")
  }

  test("streaming dedup within watermark equals batch distinct on duplicated input") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_events_dup").toString
    val ev = Tables.events(spark, SparkTestBase.Sf0001)
    ev.unionAll(ev.limit(200)).write.mode("overwrite").parquet(dir) // inject dups
    val deduped = EventPipelines.dedupStreaming(spark, dir, Seq("event_id"),
      queryName = s"dedup_${System.nanoTime()}")
    assert(deduped.count() === ev.count())
    assert(deduped.select(col("event_id")).distinct().count() === ev.count())
  }

  test("stream-stream interval join equals the bucketized batch range join") {
    val ev = Tables.events(spark, SparkTestBase.Sf0001)
    val points = ev.select(col("event_id"), col("user_id"), col("ts"))
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("iu"), col("event_id").as("error_id"),
        col("ts").as("ws"), (col("ts") + expr("INTERVAL 1 HOUR")).as("we"))
    val batch = graft.operators.RangeJoin.pointInInterval(points, intervals,
        "user_id", "iu", "ts", "ws", "we", Seq("error_id"), binSeconds = 3600)
      .select("event_id", "user_id", "ivl_error_id")
      .as[(Long, Long, Long)].collect().toSet
    val stream = EventPipelines.intervalJoinStreaming(spark, eventsDir,
        queryName = s"ivl_${System.nanoTime()}")
      .select("event_id", "user_id", "ivl_error_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  test("windowed aggregation: watermark and window state survive a checkpoint restart") {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val base = java.nio.file.Files.createTempDirectory("graft_window_ckpt").toString
    val src = s"$base/src"; val ckpt = s"$base/ckpt"; val sink = s"$base/out"
    def write(rows: Seq[(Long, String, String, Double)]): Unit =
      rows.toDF("event_id", "ts_s", "event_type", "value")
        .select(col("event_id"), lit(1L).as("user_id"),
          to_timestamp(col("ts_s")).as("ts"), col("event_type"), col("value"))
        .write.mode(SaveMode.Append).parquet(src)
    def run(): Unit = {
      val q = EventPipelines.tumblingStream(spark, src, "1 hour", "1 hour")
        .writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // batch 1: hour-0 window complete, hour-1/2 events move the watermark
    // to 01:30 -> ONLY the hour-0 window (typeA, n=2, 3.00) emits
    write(Seq((0L, "2024-01-01 00:10:00", "typeA", 1.0),
              (1L, "2024-01-01 00:20:00", "typeA", 2.0),
              (2L, "2024-01-01 01:10:00", "typeB", 3.0),
              (3L, "2024-01-01 02:30:00", "typeA", 4.0)))
    run()
    // restart: a LATE row (00:40, before the checkpointed watermark 01:30)
    // must be DROPPED — if the watermark did not survive the restart, it
    // would re-open the already-emitted hour-0 window and double-emit it
    write(Seq((4L, "2024-01-01 00:40:00", "typeA", 99.0),
              (5L, "2024-01-01 03:50:00", "typeB", 5.0)))
    run()
    // restart again: a far-future row closes every remaining window
    write(Seq((6L, "2024-01-01 06:00:00", "typeA", 0.5)))
    run()
    val got = spark.read.parquet(sink)
      .select("window_start", "event_type", "n_events", "sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq.sorted
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    assert(got === Seq(
      (t("2024-01-01 00:00:00"), "typeA", 2L, 3.0),   // late 99.0 NOT included
      (t("2024-01-01 01:00:00"), "typeB", 1L, 3.0),
      (t("2024-01-01 02:00:00"), "typeA", 1L, 4.0),
      (t("2024-01-01 03:00:00"), "typeB", 1L, 5.0)),
      s"windowed state/watermark recovery broke: $got")
  }

  test("heavy-hitter census: exact-regime stream == batch; small-k MG theorems hold") {
    val ev = Tables.events(spark, SparkTestBase.Sf0001)
    // exact per-(window, type, user) truth for both regimes
    val truth = ev
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"),
        col("user_id").cast("string").as("user"), col("n"))
      .as[(java.sql.Timestamp, String, String, Long)].collect()
      .groupBy(t => (t._1, t._2))
      .view.mapValues(_.map(t => t._3 -> t._4).toMap).toMap
    // EXACT regime: k above every group's distinct-user count -> the MG
    // summary never evicts, every estimate is the true count, and the
    // incremental multi-batch stream must equal batch BIT-FOR-BIT
    val kExact = truth.values.map(_.size).max + 1
    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select("window_start", "event_type", "frequent_users", "n_events")
      .as[(java.sql.Timestamp, String, Seq[(String, Long)], Long)].collect().toSet
    val batch = collect(EventPipelines.heavyUsersBatch(ev, "1 hour", kExact))
    val stream = collect(EventPipelines.heavyUsersStreaming(spark, eventsDir,
      "1 hour", "2 hours", kExact, s"hh_exact_${System.nanoTime()}",
      maxFilesPerTrigger = 2))
    assert(stream === batch,
      s"batch-only: ${(batch -- stream).take(2)}; stream-only: ${(stream -- batch).take(2)}")
    assert(batch.exists(_._3.nonEmpty))
    // SMALL-k regime: estimates are merge-order-dependent, but the MG
    // theorems must hold for the streaming merge sequence exactly as for
    // any batch merge tree: underestimate, n/(k+1) error bound, coverage
    val k = 3
    val small = collect(EventPipelines.heavyUsersStreaming(spark, eventsDir,
      "1 hour", "2 hours", k, s"hh_small_${System.nanoTime()}",
      maxFilesPerTrigger = 2))
    assert(small.nonEmpty)
    small.foreach { case (ws, tpe, frequent, n) =>
      val exact = truth((ws, tpe))
      assert(n === exact.values.sum)
      val bound = n / (k + 1)
      val est = frequent.toMap
      assert(frequent.size <= k)
      est.foreach { case (item, e) =>
        assert(e <= exact.getOrElse(item, 0L),
          s"overestimate for $item in ($ws,$tpe): est $e > true ${exact.get(item)}")
      }
      exact.foreach { case (user, t) =>
        assert(t - est.getOrElse(user, 0L) <= bound,
          s"error bound broken for $user in ($ws,$tpe): true $t est ${est.get(user)} bound $bound")
        if (t > bound) assert(est.contains(user),
          s"coverage broken: $user true $t > bound $bound but absent in ($ws,$tpe)")
      }
    }
  }

  test("heavy-hitter census: serialized MG state survives a checkpoint restart") {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val base = java.nio.file.Files.createTempDirectory("graft_hh_ckpt").toString
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
    // run 1: hour-0 summary (user 10 twice, user 11 once) emits when the
    // 02:10 row moves the watermark past the window end; the hour-2 row's
    // PARTIAL summary (user 20 x1) stays behind in the checkpointed state
    write(Seq((0L, 10L, "2024-01-01 00:10:00"), (1L, 10L, "2024-01-01 00:20:00"),
              (2L, 11L, "2024-01-01 00:40:00"), (3L, 20L, "2024-01-01 02:10:00")))
    run()
    // restart: hour-2 gains user 20 again and user 21 — the final hour-2
    // summary is only correct if the pre-restart partial was deserialized
    // from the state store and MERGED; a LATE hour-0 row (user 55) must be
    // dropped by the recovered watermark, not open a second hour-0 window
    write(Seq((4L, 20L, "2024-01-01 02:20:00"), (5L, 21L, "2024-01-01 02:30:00"),
              (6L, 55L, "2024-01-01 00:50:00"), (7L, 99L, "2024-01-01 05:00:00")))
    run()
    val got = spark.read.parquet(sink)
      .select("window_start", "frequent_users", "n_events")
      .as[(java.sql.Timestamp, Seq[(String, Long)], Long)].collect()
      .sortBy(_._1.getTime)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    assert(got.map(_._1) === Seq(t("2024-01-01 00:00:00"), t("2024-01-01 02:00:00")),
      s"expected exactly hour-0 and hour-2 windows once each: $got")
    assert(got(0)._2 === Seq("10" -> 2L, "11" -> 1L) && got(0)._3 === 3L,
      s"hour-0 summary wrong (late row must not reopen it): ${got(0)}")
    assert(got(1)._2 === Seq("20" -> 2L, "21" -> 1L) && got(1)._3 === 3L,
      s"hour-2 summary lost the pre-restart partial: ${got(1)}")
  }

  test("sliding windows cover each event exactly width/slide times") {
    val ev = Tables.events(spark, SparkTestBase.Sf0001)
    val total = ev.count()
    val windowed = EventPipelines.slidingBatch(ev, "1 hour", "30 minutes")
    assert(windowed.agg(sum("n_events")).as[Long].head() === total * 2)
  }
}
