package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketized range-join semantics vs a reference nested-loop join. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("points match exactly the intervals containing them (half-open)") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // == start -> in
      (1L, 11L, ts("2024-01-01 10:59:59")), // inside
      (1L, 12L, ts("2024-01-01 11:00:00")), // == end -> out (half-open)
      (1L, 13L, ts("2024-01-03 00:00:00")), // no interval
      (2L, 20L, ts("2024-01-01 10:30:00"))  // other key, own interval
    ).toDF("k", "pid", "t")
    val intervals = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, 200L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (1L, 101L, ts("2024-01-01 10:30:00"), ts("2024-01-01 12:00:00"))  // overlaps 11
    ).toDF("ik", "iid", "s", "e")

    val out = RangeJoin.pointInInterval(points, intervals,
        "k", "ik", "t", "s", "e", Seq("iid"), binSeconds = 1800)
      .select("pid", "ivl_iid").as[(Long, Long)].collect().toSet
    assert(out === Set((10L, 100L), (11L, 100L), (11L, 101L), (20L, 200L), (12L, 101L)))
  }

  test("malformed intervals (end <= start) match nothing and never explode") {
    // an epoch-zero sentinel end would make sequence(start_bin, end_bin)
    // DESCEND across ~28M bins if it reached the explode — the guard must
    // drop empty [s, e) intervals before bin generation
    val points = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("k", "pid", "t")
    val intervals = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00"), ts("1970-01-01 00:00:00")), // inverted
      (1L, 101L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00")), // zero-length
      (1L, 102L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00"))  // sane
    ).toDF("ik", "iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals,
        "k", "ik", "t", "s", "e", Seq("iid"), binSeconds = 1800)
      .select("pid", "ivl_iid").as[(Long, Long)].collect().toSet
    assert(out === Set((10L, 102L)))
  }

  test("bucketized result equals the naive non-equi join on real data") {
    val ev = graft.sources.Tables.events(spark, SparkTestBase.Sf0001)
    val points = ev.select(col("event_id"), col("user_id"), col("ts"))
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("iu"), col("event_id").as("error_id"),
        col("ts").as("ws"), (col("ts") + expr("INTERVAL 1 HOUR")).as("we"))
    val bucketized = RangeJoin.pointInInterval(points, intervals,
        "user_id", "iu", "ts", "ws", "we", Seq("error_id"), binSeconds = 3600)
      .select("event_id", "ivl_error_id").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
        col("user_id") === col("iu") && col("ts") >= col("ws") && col("ts") < col("we"))
      .select("event_id", "error_id").as[(Long, Long)].collect().toSet
    assert(bucketized === naive)
    assert(naive.nonEmpty)
  }
}
