package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.AsofJoin

/** Point-in-time join semantics on a hand-built fixture. */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("each left row gets the most recent right row at or before its time") {
    val quotes = Seq( // (key, time, price)
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 50.0)
    ).toDF("qkey", "qtime", "price")
    val trades = Seq( // (key, time, qty)
      (1L, ts("2024-01-01 10:03:00"), 5L),  // -> 100.0
      (1L, ts("2024-01-01 10:05:00"), 6L),  // exact tie -> inclusive, 101.0
      (1L, ts("2024-01-01 10:59:00"), 7L),  // -> 102.0
      (2L, ts("2024-01-01 10:06:00"), 8L),  // before any quote -> null
      (3L, ts("2024-01-01 10:06:00"), 9L)   // key never quoted -> null
    ).toDF("tkey", "ttime", "qty")

    val out = AsofJoin.asof(trades, quotes,
        "tkey", "qkey", "ttime", "qtime", Seq("price"), "qtime")
      .select("tkey", "qty", "asof_price")
      .as[(Long, Long, Option[Double])].collect().toSet

    assert(out === Set(
      (1L, 5L, Some(100.0)),
      (1L, 6L, Some(101.0)),
      (1L, 7L, Some(102.0)),
      (2L, 8L, None),
      (3L, 9L, None)))
  }

  test("forward as-of: each left row gets the earliest right row at or after its time") {
    val quotes = Seq( // (key, time, price)
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 50.0)
    ).toDF("qkey", "qtime", "price")
    val trades = Seq( // (key, time, qty)
      (1L, ts("2024-01-01 10:03:00"), 5L),  // -> 101.0 (next at 10:05)
      (1L, ts("2024-01-01 10:05:00"), 6L),  // exact tie -> inclusive, 101.0
      (1L, ts("2024-01-01 10:59:00"), 7L),  // nothing after -> null
      (2L, ts("2024-01-01 10:06:00"), 8L),  // -> 50.0 (10:07)
      (3L, ts("2024-01-01 10:06:00"), 9L)   // key never quoted -> null
    ).toDF("tkey", "ttime", "qty")

    val out = AsofJoin.asofForward(trades, quotes,
        "tkey", "qkey", "ttime", "qtime", Seq("price"), "qtime")
      .select("tkey", "qty", "asof_price")
      .as[(Long, Long, Option[Double])].collect().toSet

    assert(out === Set(
      (1L, 5L, Some(101.0)),
      (1L, 6L, Some(101.0)),
      (1L, 7L, None),
      (2L, 8L, Some(50.0)),
      (3L, 9L, None)))
  }

  test("forward ties on right time resolve to the SMALLEST tiebreak deterministically") {
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 00:00:00"), "b")
    ).toDF("rkey", "rtime", "v")
    val left = Seq((1L, ts("2023-12-31 00:00:00"))).toDF("lkey", "ltime")
    val out = AsofJoin.asofForward(left, right,
        "lkey", "rkey", "ltime", "rtime", Seq("v"), "v")
      .select("asof_v").as[String].collect().toSeq
    assert(out === Seq("a"))
  }

  test("ties on right time resolve to the last tiebreak value deterministically") {
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 00:00:00"), "b")
    ).toDF("k", "t", "v")
    val left = Seq((1L, ts("2024-01-01 00:00:01"))).toDF("k2", "t2")
    val out = AsofJoin.asof(left, right, "k2", "k", "t2", "t", Seq("v"), "v")
      .select("asof_v").as[String].collect()
    assert(out.toSeq === Seq("b"))
  }

  test("NUMERIC tiebreaks order numerically, not lexicographically") {
    // ids 9 vs 10: a string-cast tiebreak would order "10" < "9" and
    // return the wrong winner on both directions
    val right = Seq(
      (1L, ts("2024-01-01 00:00:00"), 9L, "nine"),
      (1L, ts("2024-01-01 00:00:00"), 10L, "ten")
    ).toDF("k", "t", "rid", "v")
    val back = AsofJoin.asof(
        Seq((1L, ts("2024-01-01 00:00:01"))).toDF("k2", "t2"),
        right, "k2", "k", "t2", "t", Seq("v"), "rid")
      .select("asof_v").as[String].collect().toSeq
    assert(back === Seq("ten"), "backward as-of must keep the LARGEST tiebreak")
    val fwd = AsofJoin.asofForward(
        Seq((1L, ts("2023-12-31 00:00:00"))).toDF("k2", "t2"),
        right, "k2", "k", "t2", "t", Seq("v"), "rid")
      .select("asof_v").as[String].collect().toSeq
    assert(fwd === Seq("nine"), "forward as-of must keep the SMALLEST tiebreak")
  }
}
