package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.sources.Tables
import graft.streaming._

/** Serving-bootstrap contract: every stream builder accepts an explicit
  * source schema, so an always-on serving process can START against an
  * EMPTY source directory (before its producer has written a single file)
  * and pick data up as it arrives. Without the explicit schema, parquet
  * schema inference on an empty dir throws — that inference remains the
  * convenient default for replay/backfill and is pinned as the documented
  * failure mode below.
  */
class StreamingBootstrapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** µs-normalized events schema, read from testdata — stands in for the
    * schema a serving deployment would declare statically. */
  private lazy val eventsSchema: StructType =
    Tables.events(spark, SparkTestBase.Sf0001).schema

  private def emptyDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_boot_$tag").toString

  private def fillEvents(dir: String): Unit =
    Tables.events(spark, SparkTestBase.Sf0001)
      .write.mode("append").parquet(dir)

  /** Start `df` on a memory sink, drain, run `step`, drain again, stop. */
  private def withMemoryQuery[A](df: DataFrame, mode: OutputMode, name: String)(
      step: StreamingQuery => A): A = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(50))
      .start()
    try step(q) finally q.stop()
  }

  test("tumbling aggregation boots on an empty dir and catches up once files arrive") {
    val dir = emptyDir("tumbling")
    val name = s"boot_tumbling_${System.nanoTime()}"
    val df = EventPipelines.tumblingStream(spark, dir, schema = Some(eventsSchema))
    withMemoryQuery(df, OutputMode.Complete(), name) { q =>
      q.processAllAvailable()
      assert(spark.table(name).isEmpty, "no data yet -> empty result")
      fillEvents(dir)
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val want = EventPipelines.tumblingBatch(Tables.events(spark, SparkTestBase.Sf0001))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(want.nonEmpty && got === want)
    }
  }

  test("funnel fold boots on an empty dir and catches up once files arrive") {
    val steps = Seq("view", "click", "purchase")
    val dir = emptyDir("funnel")
    val name = s"boot_funnel_${System.nanoTime()}"
    val df = StreamingFunnel
      .reachStream(spark, dir, steps, schema = Some(eventsSchema)).toDF()
    withMemoryQuery(df, OutputMode.Append(), name) { q =>
      q.processAllAvailable()
      assert(spark.table(name).isEmpty)
      fillEvents(dir)
      q.processAllAvailable()
      val got = spark.table(name).as[StreamingFunnel.Reach].collect()
        .map(r => (r.user_id, r.step, r.step_name, r.reach_ts)).toSet
      val want = StreamingFunnel
        .reachBatch(Tables.events(spark, SparkTestBase.Sf0001), steps)
        .collect().map(r => (r.user_id, r.step, r.step_name, r.reach_ts)).toSet
      assert(want.nonEmpty && got === want)
    }
  }

  test("transitions fold boots on an empty dir and catches up once files arrive") {
    val dir = emptyDir("transitions")
    val name = s"boot_transitions_${System.nanoTime()}"
    val df = StreamingTransitions
      .transitionsStream(spark, dir, schema = Some(eventsSchema)).toDF()
    withMemoryQuery(df, OutputMode.Append(), name) { q =>
      q.processAllAvailable()
      assert(spark.table(name).isEmpty)
      fillEvents(dir)
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(t => t).view.mapValues(_.length).toMap
      val want = StreamingTransitions
        .transitionsBatch(Tables.events(spark, SparkTestBase.Sf0001))
        .collect()
        .map(r => (r.user_id, r.src_type, r.dst_type))
        .groupBy(t => t).view.mapValues(_.length).toMap
      assert(want.nonEmpty && got === want)
    }
  }

  test("every builder starts (AvailableNow) against an empty dir with an explicit schema") {
    val sch = Some(eventsSchema)
    def nonce(tag: String) = s"boot_${tag}_${System.nanoTime()}"
    // wrappers that run AvailableNow + await: empty dir + explicit schema
    // must yield an EMPTY result, never an inference failure
    assert(EventPipelines.tumblingStreaming(spark, emptyDir("t2"),
      queryName = nonce("t2"), schema = sch).isEmpty)
    assert(EventPipelines.dedupStreaming(spark, emptyDir("dd"), Seq("event_id"),
      queryName = nonce("dd"), schema = sch).isEmpty)
    assert(EventPipelines.heavyUsersStreaming(spark, emptyDir("hu"),
      queryName = nonce("hu"), schema = sch).isEmpty)
    assert(EventPipelines.intervalJoinStreaming(spark, emptyDir("ij"),
      queryName = nonce("ij"), schema = sch).isEmpty)
    assert(EventPipelines.sessionizeStreaming(spark, emptyDir("ss"),
      queryName = nonce("ss"), schema = sch).isEmpty)
    assert(StatefulPipelines.alertsStreaming(spark, emptyDir("al"),
      queryName = nonce("al"), schema = sch).isEmpty)
    assert(StreamingAnomaly.rowsStreaming(spark, emptyDir("an"),
      queryName = nonce("an"), schema = sch).isEmpty)
    assert(StreamingAttribution.attributedStreaming(spark, emptyDir("at"),
      queryName = nonce("at"), schema = sch).isEmpty)
    assert(StreamingFunnel.reachStreaming(spark, emptyDir("fu"),
      Seq("view", "click"), queryName = nonce("fu"), schema = sch).isEmpty)
    assert(StreamingGapFill.rowsStreaming(spark, emptyDir("gf"),
      queryName = nonce("gf"), schema = sch).isEmpty)
    assert(StreamingGrowth.cellsStreaming(spark, emptyDir("gr"),
      queryName = nonce("gr"), schema = sch).isEmpty)
    assert(StreamingLtv.cellsStreaming(spark, emptyDir("lt"),
      queryName = nonce("lt"), schema = sch).isEmpty)
    assert(StreamingRetention.cellsStreaming(spark, emptyDir("re"),
      queryName = nonce("re"), schema = sch).isEmpty)
    assert(StreamingTransitions.transitionsStreaming(spark, emptyDir("tr"),
      queryName = nonce("tr"), schema = sch).isEmpty)
  }

  test("without an explicit schema an empty dir still fails fast (documented default)") {
    val ex = intercept[Exception] {
      EventPipelines.tumblingStreaming(spark, emptyDir("noschema"),
        queryName = s"boot_ns_${System.nanoTime()}")
    }
    assert(ex.getMessage != null)
  }
}
