package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.streaming.StatefulPipelines
import graft.streaming.StatefulPipelines.{Alert, Event, UserState}

/** flatMapGroupsWithState parity: the streaming state machine must replay
  * the exact same transitions as the batch fold over identical data. */
class StatefulPipelinesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("transition function: spend alert fires once, error alert on the 3rd consecutive") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var st = UserState(0.0, 0, alertedSpend = false)
    def feed(tpe: String, v: Double): List[Alert] = {
      val (next, alerts) = StatefulPipelines.step(st, Event(1L, ts, tpe, v))
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
}
