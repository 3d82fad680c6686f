package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAnalytics

/** Funnel / cohort-retention / gap-fill semantics on hand-computed
  * micro-corpora (the ev_funnel / ev_retention / ev_gapfill queries'
  * operator layer). */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: monotone chain, deadline anchored at step 1, order enforced") {
    val events = Seq(
      // u1 completes all three inside the 24h window
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // u2's only click PRECEDES its first view: click must not count
      (2L, ts("2024-01-01 00:00:00"), "click"),
      (2L, ts("2024-01-01 01:00:00"), "view"),
      // u3 purchases at +30h: past the step-1-anchored 24h deadline
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 01:00:00"), "click"),
      (3L, ts("2024-01-02 06:00:00"), "purchase"),
      // u4 never views: reaches nothing
      (4L, ts("2024-01-01 00:00:00"), "click"),
      // u5: click at the SAME instant as view (ts >= s1 counts) and
      // purchase exactly AT the deadline (<= counts)
      (5L, ts("2024-01-01 00:00:00"), "view"),
      (5L, ts("2024-01-01 00:00:00"), "click"),
      (5L, ts("2024-01-02 00:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics
      .funnel(events, Seq("view", "click", "purchase"), windowHours = 24)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      (1L, "view", 4L),      // u1 u2 u3 u5
      (2L, "click", 3L),     // u1 u3 u5
      (3L, "purchase", 2L))) // u1 u5
  }

  test("retention: anniversary offsets, cohort isolation, offset-0 size") {
    val events = Seq(
      // uA: first 2024-01-01 (epoch day 19723, cohort week 2817),
      // returns at +8d (offset 1) and +15d (offset 2)
      (10L, ts("2024-01-01 12:00:00")),
      (10L, ts("2024-01-09 12:00:00")),
      (10L, ts("2024-01-16 12:00:00")),
      // uB: same cohort, only the signup week
      (11L, ts("2024-01-01 08:00:00")),
      (11L, ts("2024-01-03 08:00:00")),
      // uC: first 2024-01-10 (epoch day 19732, cohort week 2818),
      // returns at +15d (offset 2)
      (12L, ts("2024-01-10 00:00:00")),
      (12L, ts("2024-01-25 00:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.retention(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got === Set(
      (2817L, 0L, 2L, 2L, 1.0),
      (2817L, 1L, 1L, 2L, 0.5),
      (2817L, 2L, 1L, 2L, 0.5),
      (2818L, 0L, 1L, 1L, 1.0),
      (2818L, 2L, 1L, 1L, 1.0)))
  }

  test("funnel: 4-step chain re-anchors each step on the previous reach") {
    val events = Seq(
      // u1 walks all four steps inside the window
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 01:00:00"), "view"),
      (1L, ts("2024-01-01 02:00:00"), "click"),
      (1L, ts("2024-01-01 03:00:00"), "purchase"),
      // u2 clicks BEFORE its first view: the click cannot serve step 3,
      // and no later click exists -> stuck at step 2
      (2L, ts("2024-01-01 00:00:00"), "signup"),
      (2L, ts("2024-01-01 00:30:00"), "click"),
      (2L, ts("2024-01-01 01:00:00"), "view"),
      (2L, ts("2024-01-01 02:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics
      .funnel(events, Seq("signup", "view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("abtest: parity variants, exposure gate, exact pooled z-score") {
    val events = Seq(
      // variant A (even ids): u2 converts, u4 doesn't, u6 never exposed
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 05:00:00"), "purchase"),
      (4L, ts("2024-01-01 00:00:00"), "view"),
      (6L, ts("2024-01-01 00:00:00"), "purchase"),
      // variant B (odd ids): u3 converts, u1 converts LATE (+30h), u5 doesn't
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-02 06:00:00"), "purchase"),
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 01:00:00"), "purchase"),
      (5L, ts("2024-01-01 00:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.abTest(events).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)) ===
      ((2L, 1L, 3L, 1L))) // n_a, conv_a, n_b, conv_b
    val pA = 1.0 / 2L; val pB = 1.0 / 3L
    assert(r.getDouble(2) === pA && r.getDouble(5) === pB)
    // replicate the EXACT association — same IEEE ops, same order
    val pbar = (1L + 1L).toDouble / (2L + 3L)
    val z = (pA - pB) / math.sqrt((pbar * (1.0 - pbar)) * (1.0 / 2L + 1.0 / 3L))
    assert(r.getDouble(6) === z)
    assert(r.getBoolean(7) === (math.abs(z) > 1.96))
  }

  test("funnel: quoted step names are data, not SQL; empty input -> 0 rows") {
    // a step type containing a single quote must survive verbatim (the
    // summary is built from typed Columns, never interpolated SQL)
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), "it's-a-view"),
      (1L, ts("2024-01-01 01:00:00"), "add'to'cart")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics
      .funnel(events, Seq("it's-a-view", "add'to'cart"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("it's-a-view", 1L), ("add'to'cart", 1L)))
    // empty input: zero rows (not k rows of NULL from the groupless agg)
    val empty = Seq.empty[(Long, Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    assert(EventAnalytics.funnel(empty, Seq("view", "click")).count() === 0L)
  }

  test("abtest: truncated modulo — negative ids land in neither arm") {
    val events = Seq(
      (-7L, ts("2024-01-01 00:00:00"), "view"), // -7 % 2 = -1: no arm
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 01:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val r = EventAnalytics.abTest(events).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)) ===
      ((1L, 0L, 1L, 1L))) // n_a, conv_a, n_b, conv_b — u-7 counted nowhere
  }

  test("gap-fill: NULL daily sum is a gap; fill carries last non-NULL") {
    val events = Seq(
      // day 1 sums to 4.0; day 2 observed but all values NULL (sum NULL:
      // a gap per the contract); day 3 back to a real sum
      (30L, ts("2024-01-01 09:00:00"), "purchase", Some(4.0)),
      (30L, ts("2024-01-02 09:00:00"), "purchase", None),
      (30L, ts("2024-01-03 09:00:00"), "purchase", Some(2.0)),
      // a user whose FIRST day is all-NULL: filled_value stays NULL there
      (31L, ts("2024-01-01 09:00:00"), "purchase", None),
      (31L, ts("2024-01-02 09:00:00"), "purchase", Some(7.0))
    ).toDF("user_id", "ts", "event_type", "value")
    val got = EventAnalytics.gapFill(events, "purchase").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))).toSet
    assert(got === Set(
      (30L, "2024-01-01", Some(4.0), Some(4.0), false),
      (30L, "2024-01-02", None, Some(4.0), true),
      (30L, "2024-01-03", Some(2.0), Some(2.0), false),
      (31L, "2024-01-01", None, None, true),
      (31L, "2024-01-02", Some(7.0), Some(7.0), false)))
  }

  test("gap-fill: exact daily sums, forward fill across gaps, span per user") {
    val events = Seq(
      // uA: two purchases on day 1 (sum 12.75), one on day 4; days 2-3 gap
      (20L, ts("2024-01-01 09:00:00"), "purchase", 10.5),
      (20L, ts("2024-01-01 15:00:00"), "purchase", 2.25),
      (20L, ts("2024-01-04 11:00:00"), "purchase", 5.0),
      // uB: single purchase day — one row, no gaps
      (21L, ts("2024-01-02 10:00:00"), "purchase", 1.0),
      // uC: no purchases at all — excluded from the output
      (22L, ts("2024-01-01 10:00:00"), "view", 99.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val got = EventAnalytics.gapFill(events, "purchase").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getDouble(3), r.getBoolean(4))).toSet
    assert(got === Set(
      (20L, "2024-01-01", Some(12.75), 12.75, false),
      (20L, "2024-01-02", None, 12.75, true),
      (20L, "2024-01-03", None, 12.75, true),
      (20L, "2024-01-04", Some(5.0), 5.0, false),
      (21L, "2024-01-02", Some(1.0), 1.0, false)))
  }

  test("rolling anomaly: exact integer z-test, min-window gate, zero-variance strictness") {
    def row(u: Long, minute: Int, v: Double, id: Long) =
      (u, ts(f"2024-01-01 00:$minute%02d:00"), "purchase", v, id)
    val events = (
      // u1: five flat 10.00 readings, then a 20.00 spike. Trailing window
      // at the spike: n=5, S=5000, Q=5e6 (zero variance) -> dev_sq
      // (5*2000-5000)^2 = 25e6 > 0 flags. The follow-up 10.00 reading sees
      // the spike inside its window (n=6, S=7000, Q=9e6): dev_sq 1e6 vs
      // var_scaled 4*(6*9e6-49e6)=2e7 -> quiet.
      (1 to 5).map(i => row(1L, i, 10.00, 100L + i)) ++ Seq(
        row(1L, 6, 20.00, 106L),
        row(1L, 7, 10.00, 107L)) ++
      // u2: alternating 10/12 (real variance), then 16.00: prev cents
      // [1000,1200,1000,1200,1000] -> S=5400, Q=5.88e6; dev_sq
      // (5*1600-5400)^2=6.76e6 > 4*(5*5.88e6-5400^2)=9.6e5 flags; the
      // 11.00 after it (n=6, S=7000, Q=8.44e6) is quiet: 1.6e5 < 6.56e6.
      Seq(10.00, 12.00, 10.00, 12.00, 10.00).zipWithIndex.map {
        case (v, i) => row(2L, i + 1, v, 200L + i) } ++ Seq(
        row(2L, 6, 16.00, 206L),
        row(2L, 7, 11.00, 207L)) ++
      // u3: below the min-window gate entirely
      (1 to 3).map(i => row(3L, i, 50.00, 300L + i)) ++
      // non-qualifying event type never enters any window
      Seq((1L, ts("2024-01-01 00:03:30"), "view", 999.0, 400L))
    ).toDF("user_id", "ts", "event_type", "value", "event_id")
    val got = EventAnalytics.rollingAnomaly(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === Set(
      (1L, 106L, 2000L, 5L, 25000000L, 0L),
      (2L, 206L, 1600L, 5L, 6760000L, 960000L)))
  }

  test("rolling anomaly matches a plain-Scala window reference on randomized events") {
    val rng = new scala.util.Random(20260814L)
    val events = (1L to 600L).map { id =>
      val u = rng.nextInt(8).toLong
      val t = ts(f"2024-01-01 ${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:${rng.nextInt(60)}%02d")
      val v = math.round(rng.nextDouble() * 5000) / 100.0 // exact 2-decimal doubles
      (u, t, "purchase", v, id)
    }
    val df = events.toDF("user_id", "ts", "event_type", "value", "event_id")
    val got = EventAnalytics.rollingAnomaly(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    // brute trailing-window reference: same (ts, event_id) order, same
    // integer predicate — duplicate-second timestamps exercise the tiebreak
    val want = events.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._5))
      val cents = sorted.map(e => math.round(e._4 * 100))
      cents.indices.flatMap { i =>
        val w = cents.slice(math.max(0, i - 10), i)
        val n = w.size.toLong
        if (n < 5) None
        else {
          val s = w.sum
          val q = w.map(c => c * c).sum
          val dev = n * cents(i) - s
          val devSq = dev * dev
          val varScaled = 4L * (n * q - s * s)
          if (devSq > varScaled)
            Some((u, sorted(i)._5, cents(i), n, devSq, varScaled))
          else None
        }
      }
    }.toSet
    assert(want.nonEmpty && got === want)
  }

  test("attribution: last qualifying touch wins; deadline and ties exact") {
    val events = Seq(
      // u1: view then click, two purchases — BOTH credit the latest touch
      // (the click), including the second purchase with no touch between
      (1L, 1L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (1L, 2L, ts("2024-01-01 01:00:00"), "click", 0.0),
      (1L, 3L, ts("2024-01-01 02:00:00"), "purchase", 10.0),
      (1L, 4L, ts("2024-01-01 05:00:00"), "purchase", 5.5),
      // u2: no touch at all -> (direct)
      (2L, 5L, ts("2024-01-01 00:00:00"), "purchase", 3.0),
      // u3: view 84h before the purchase — past the 72h window -> (direct)
      (3L, 6L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (3L, 7L, ts("2024-01-04 12:00:00"), "purchase", 2.0),
      // u4: view and click at the SAME ts — event_id orders them, click
      // (higher id) is the last touch
      (4L, 8L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (4L, 9L, ts("2024-01-01 00:00:00"), "click", 0.0),
      (4L, 10L, ts("2024-01-01 00:30:00"), "purchase", 1.0),
      // u5: touch at the same ts as the purchase but a SMALLER id — it is
      // a strictly-preceding row and counts (gap 0 <= window)
      (5L, 11L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (5L, 12L, ts("2024-01-01 00:00:00"), "purchase", 4.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = EventAnalytics.attribution(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === Set(
      ("click", 3L, 2L, 16.5),
      ("view", 1L, 1L, 4.0),
      ("(direct)", 2L, 2L, 5.0)))
  }

  test("transitions: adjacent bigrams, session gap gate, same-ts id order") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 01:00:00"), "click"),
      (1L, 3L, ts("2024-01-01 01:30:00"), "purchase"),
      // +25h after the purchase: past the 24h gap, transition dropped
      (1L, 4L, ts("2024-01-02 02:30:00"), "error"),
      (2L, 5L, ts("2024-01-01 00:00:00"), "view"),
      (2L, 6L, ts("2024-01-01 00:10:00"), "view"),
      (2L, 7L, ts("2024-01-01 00:20:00"), "click"),
      // u3: same-ts pair ordered by event_id -> click precedes view
      (3L, 8L, ts("2024-01-01 00:00:00"), "click"),
      (3L, 9L, ts("2024-01-01 00:00:00"), "view")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventAnalytics.transitions(events).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      ("view", "click") -> ((2L, 2L)),
      ("click", "purchase") -> ((1L, 1L)),
      ("view", "view") -> ((1L, 1L)),
      ("click", "view") -> ((1L, 1L))))
  }

  test("cohort LTV: exact decimal cells, running per-user curve, cohort isolation") {
    val events = Seq(
      // uA: cohort 2817; purchases at offsets 0 and 1, a view at offset 3
      (1L, ts("2024-01-01 10:00:00"), "purchase", Some(10.0)),
      (1L, ts("2024-01-09 10:00:00"), "purchase", Some(5.5)),
      (1L, ts("2024-01-22 10:00:00"), "view", Some(0.0)),
      // uB: same cohort; purchase at offset 0 only
      (2L, ts("2024-01-01 09:00:00"), "view", Some(0.0)),
      (2L, ts("2024-01-02 09:00:00"), "purchase", Some(2.25)),
      // uC: cohort 2818, isolated
      (3L, ts("2024-01-10 09:00:00"), "purchase", Some(1.0))
    ).toDF("user_id", "ts", "event_type", "value")
    val got = EventAnalytics.cohortLtv(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got === Map(
      (2817L, 0L) -> ((2L, 2L, 12.25, 6.125)),
      (2817L, 1L) -> ((1L, 2L, 5.5, 8.875)),
      (2817L, 3L) -> ((1L, 2L, 0.0, 8.875)), // active, no revenue: exact 0
      (2818L, 0L) -> ((1L, 1L, 1.0, 1.0))))
    // the curve is monotone non-decreasing within each cohort
    val curve2817 = got.collect { case ((2817L, o), v) => (o, v._4) }.toSeq.sortBy(_._1)
    assert(curve2817.map(_._2) === curve2817.map(_._2).sorted)
  }

  test("growth accounting: new/retained/resurrected/churned; identity holds") {
    val events = Seq(
      // uA: weeks 2817, 2818, then a gap, then 2820 — new, retained,
      // churned@2819, resurrected@2820
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 10:00:00")), // same week — must not double-count
      (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-22 10:00:00")),
      // uB: week 2818 only — new there, churned@2819
      (2L, ts("2024-01-08 09:00:00")),
      // uC: week 2820 only — new; NO churn row (data ends at max week)
      (3L, ts("2024-01-22 09:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.growthAccounting(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got === Map(
      2817L -> ((1L, 0L, 0L, 0L)),
      2818L -> ((1L, 1L, 0L, 0L)),
      2819L -> ((0L, 0L, 0L, 2L)),
      2820L -> ((1L, 0L, 1L, 0L))))
    // accounting identity: active(w) = new + retained + resurrected
    assert(got(2817L)._1 + got(2817L)._2 + got(2817L)._3 === 1L)
    assert(got(2818L)._1 + got(2818L)._2 + got(2818L)._3 === 2L)
    assert(got(2820L)._1 + got(2820L)._2 + got(2820L)._3 === 2L)
  }

  test("scd2: run-collapsing versions, abutting intervals, one open current row") {
    import org.apache.spark.sql.functions.lit
    val events = Seq(
      // u1: 10,10,20,20,10 -> three versions (10, 20, 10)
      (1L, ts("2024-01-01 00:00:00"), Some(10L), 1L),
      (1L, ts("2024-01-02 00:00:00"), Some(10L), 2L),
      (1L, ts("2024-01-03 00:00:00"), Some(20L), 3L),
      (1L, ts("2024-01-04 00:00:00"), Some(20L), 4L),
      (1L, ts("2024-01-05 00:00:00"), Some(10L), 5L),
      // u2: a single reading -> one open version
      (2L, ts("2024-01-01 00:00:00"), Some(7L), 6L),
      // u3: NULL-first, value, NULL again -> three versions (null-safe detect)
      (3L, ts("2024-01-01 00:00:00"), None, 7L),
      (3L, ts("2024-01-02 00:00:00"), Some(5L), 8L),
      (3L, ts("2024-01-03 00:00:00"), None, 9L),
      // u4: ts tie broken by event_id -> versions ordered (1 then 2)
      (4L, ts("2024-01-01 00:00:00"), Some(1L), 11L),
      (4L, ts("2024-01-01 00:00:00"), Some(2L), 12L))
      .toDF("user_id", "ts", "tier", "event_id")
      .withColumn("event_type", lit("purchase"))

    val dim = EventAnalytics.scd2(events, "purchase", attrCol = "tier")
      .select("user_id", "attr", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, Option[Long], Timestamp, Option[Timestamp], Long, Boolean)]
      .collect().sortBy(r => (r._1, r._5))

    val u1 = dim.filter(_._1 == 1L)
    assert(u1.map(_._2) === Seq(Some(10L), Some(20L), Some(10L)))
    assert(u1.map(_._5) === Seq(1L, 2L, 3L), "versions are a dense 1-based sequence")
    // intervals abut: valid_to(i) == valid_from(i+1); only the last is open
    assert(u1.init.zip(u1.tail).forall { case (a, b) => a._4.contains(b._3) })
    assert(u1.map(_._6) === Seq(false, false, true))
    assert(u1.head._3 === ts("2024-01-01 00:00:00"), "version 1 opens at the FIRST reading of the run")

    val u2 = dim.filter(_._1 == 2L)
    assert(u2.map(r => (r._2, r._4, r._5, r._6)) === Seq((Some(7L), None, 1L, true)))

    val u3 = dim.filter(_._1 == 3L)
    assert(u3.map(_._2) === Seq(None, Some(5L), None),
      "NULL attr readings open/close versions null-safely")

    val u4 = dim.filter(_._1 == 4L)
    assert(u4.map(_._2) === Seq(Some(1L), Some(2L)), "ts ties order by event_id")

    // exactly one current version per key
    assert(dim.groupBy(_._1).forall { case (_, rs) => rs.count(_._6) == 1 })
  }

  test("scd2 + as-of lookup: facts pick the version in force, boundaries inclusive") {
    import org.apache.spark.sql.functions.{col, lit}
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), Some(10L), 1L),
      (1L, ts("2024-01-03 00:00:00"), Some(20L), 2L))
      .toDF("user_id", "ts", "tier", "event_id")
      .withColumn("event_type", lit("purchase"))
    val dim = EventAnalytics.scd2(changes, "purchase", attrCol = "tier")
    val facts = Seq(
      (100L, 1L, ts("2023-12-31 00:00:00")), // before any version -> NULLs
      (101L, 1L, ts("2024-01-01 00:00:00")), // exactly at v1 open -> v1 (inclusive)
      (102L, 1L, ts("2024-01-02 00:00:00")), // inside v1
      (103L, 1L, ts("2024-01-03 00:00:00")), // exactly at the change -> v2
      (104L, 1L, ts("2024-01-09 00:00:00"))  // in the open current version
    ).toDF("event_id", "user_id", "ts")
    val got = graft.operators.AsofJoin.asof(facts,
        dim.select(col("user_id").as("d_user"), col("valid_from"),
          col("attr"), col("version")),
        "user_id", "d_user", "ts", "valid_from",
        Seq("attr", "version"), "version")
      .select("event_id", "asof_attr", "asof_version")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(100L) === ((None, None)))
    assert(got(101L) === ((Some(10L), Some(1L))))
    assert(got(102L) === ((Some(10L), Some(1L))))
    assert(got(103L) === ((Some(20L), Some(2L))))
    assert(got(104L) === ((Some(20L), Some(2L))))
  }
}
