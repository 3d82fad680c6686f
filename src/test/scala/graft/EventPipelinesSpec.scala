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

  test("sliding windows cover each event exactly width/slide times") {
    val ev = Tables.events(spark, SparkTestBase.Sf0001)
    val total = ev.count()
    val windowed = EventPipelines.slidingBatch(ev, "1 hour", "30 minutes")
    assert(windowed.agg(sum("n_events")).as[Long].head() === total * 2)
  }
}
