package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch event-analytics operators over the `events` table — the funnel /
 * cohort-retention / time-series-gap-fill trio every product-analytics
 * engine ships and the reference's eager single-table model cannot express
 * (SURVEY.md §7.5 scale surface; the reference has no event analytics —
 * these extend the §2.9 extension surface the same way EventPipelines does
 * for streaming).
 *
 * Scale shapes (the reason these are operators and not example SQL):
 *
 *  - [[funnel]]: the per-user step chain is computed with STACKED
 *    unordered window aggregates over one `PARTITION BY user` — every
 *    stage reuses the single user-hash exchange (no self-joins, which is
 *    how funnel queries die at scale: a k-step funnel as a k-way join
 *    shuffles the event table k times). The final summary is k rows.
 *  - [[retention]]: one user-hash exchange (first-seen via window), one
 *    (cohort, offset) count-distinct aggregate, and a broadcast of the
 *    per-cohort sizes (rows = number of cohorts, bounded by calendar
 *    weeks, never by users).
 *  - [[gapFill]]: the day spine is generated per user with `sequence()`
 *    (rows bounded by each user's own active-day span — never a global
 *    calendar cross join) and the forward fill is one ordered window per
 *    user. Shuffles carry (user, day, double) triples only.
 */
object EventAnalytics {

  /**
   * Ordered-step funnel with a conversion deadline anchored at step 1.
   *
   * A user "reaches" step 1 at their earliest `steps(0)` event; step i>1
   * at their earliest `steps(i-1)` event at-or-after the step-(i-1) reach
   * time and within `windowHours` of the step-1 reach time. Because each
   * step's qualifying window references the previous step's reach time,
   * the chain is monotone: a user counted at step i is counted at every
   * step before it (the funnel property; re-orderings like click-then-view
   * do NOT count).
   *
   * Returns one row per step: (step 1-based BIGINT, step_name,
   * n_users BIGINT = users reaching at-or-past the step). Exact counts —
   * no sampling, no sketching — and deterministic for any event order.
   */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type",
             windowHours: Int = 24): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps (got ${steps.size})")
    require(steps.distinct.size == steps.size, s"duplicate step types in $steps")
    val w = Window.partitionBy(userCol)
    // s1..sk as stacked unordered window mins; each select layer may
    // reference the previous layer's column, all sharing one exchange
    val s1 = events.withColumn("__s1",
      min(when(col(typeCol) === steps.head, col(tsCol))).over(w))
      .withColumn("__deadline",
        col("__s1") + expr(s"INTERVAL $windowHours HOURS"))
    val chained = steps.zipWithIndex.tail.foldLeft(s1) { case (df, (st, i)) =>
      df.withColumn(s"__s${i + 1}",
        min(when(col(typeCol) === st &&
          col(tsCol) >= col(s"__s$i") && col(tsCol) <= col("__deadline"),
          col(tsCol))).over(w))
    }
    // per-user reach = number of non-null step times (monotone chain),
    // then one tiny k-row summary
    val stepCols: Seq[Column] = steps.indices.map(i => col(s"__s${i + 1}"))
    val perUser = chained.groupBy(col(userCol))
      .agg(max(stepCols.map(c => c.isNotNull.cast("int"))
        .reduce(_ + _)).as("__reach"))
    val stepSums = steps.indices.map(i =>
      sum(when(col("__reach") >= i + 1, 1L).otherwise(0L)).as(s"__n${i + 1}"))
    val counts = perUser.agg(stepSums.head, stepSums.tail: _*)
    // typed array+explode (NOT a string-built stack(...): step names are
    // user data and must never be spliced into generated SQL), then drop
    // the all-NULL summary row an empty input produces — a global agg with
    // no groups emits one row of NULL sums, while zero steps were reached,
    // so the contract (and the oracle's CROSS JOIN against an empty
    // per-user frame) is zero output rows
    val entries = steps.zipWithIndex.map { case (st, i) =>
      struct(lit((i + 1).toLong).as("step"), lit(st).as("step_name"),
        col(s"__n${i + 1}").as("n_users"))
    }
    counts.select(explode(array(entries: _*)).as("__e"))
      .select(col("__e.step").as("step"), col("__e.step_name").as("step_name"),
        col("__e.n_users").as("n_users"))
      .where(col("n_users").isNotNull)
  }

  /**
   * Weekly cohort retention, anniversary-based: a user's cohort is the
   * 7-day bucket of their first-ever event (`cohort_week` = epoch-day of
   * first event `div` 7), and an event at day d lands in
   * `week_offset = (d - first_day) div 7` — offset 0 is the signup week
   * itself, so `n_active` at offset 0 equals the cohort size.
   *
   * Output: (cohort_week BIGINT, week_offset BIGINT, n_active BIGINT,
   * cohort_size BIGINT, retained_frac DOUBLE = n_active / cohort_size).
   * Day arithmetic is integer throughout (epoch days, floor division on
   * non-negative values), so every engine computes identical buckets.
   */
  def retention(events: DataFrame,
                userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(userCol)
    val ed = events.select(col(userCol).as("user_id"),
      datediff(col(tsCol).cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("__ed"))
      .withColumn("__first_ed", min(col("__ed")).over(w))
    val perCell = ed
      .select(col("user_id"),
        expr("__first_ed div 7").as("cohort_week"),
        expr("(__ed - __first_ed) div 7").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("user_id")).as("n_active"))
    // cohort size = the offset-0 cell (every user's first event is offset
    // 0), read with a window over the CELL frame — rows = cohorts ×
    // offsets, so the extra exchange is tiny, and the event table is
    // scanned exactly once (a self-join here re-scans the fact table:
    // Spark does not reuse the subtree across join inputs)
    val wc = Window.partitionBy("cohort_week")
    perCell
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(wc))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size"))
          .as("retained_frac"))
  }

  /**
   * A/B experiment readout: deterministic variant assignment, funnel-style
   * conversion, and a pooled two-proportion z-score — the experiment
   * analysis every product-analytics engine ships next to funnels.
   *
   * Variant = `user_id % 2` (truncated modulo: 0 → A, 1 → B; a negative
   * id's -1 lands in neither arm, matching SQL `%` in every engine):
   * deterministic, mirrorable, and independent of event order. A user is EXPOSED at
   * their first `exposeType` event and CONVERTED at the first
   * `convertType` event at-or-after exposure within `windowHours` (the
   * two-step funnel chain, stacked on one user-hash exchange).
   *
   * Determinism contract: conversion counts are exact longs; the derived
   * rates and the z-score use only IEEE-754 correctly-rounded operations
   * (+ - * / sqrt) in a FIXED association mirrored by the SQL oracle, so
   * the doubles are bit-identical across engines. `z_score` is NULL when
   * either arm has no exposures (NULLIF guard, no division by zero).
   *
   * Output (one row): n_a, conv_a, p_a, n_b, conv_b, p_b, z_score,
   * significant (|z| > 1.96). Scale shape: stacked per-user windows
   * (one exchange), a per-user aggregate reusing that partitioning, and
   * one single-row conditional aggregate — no joins at all.
   */
  def abTest(events: DataFrame, exposeType: String = "view",
             convertType: String = "purchase",
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type",
             windowHours: Int = 24): DataFrame = {
    val w = Window.partitionBy(userCol)
    val chained = events
      .withColumn("__ev", min(when(col(typeCol) === exposeType, col(tsCol))).over(w))
      .withColumn("__cv", min(when(col(typeCol) === convertType &&
        col(tsCol) >= col("__ev") &&
        col(tsCol) <= col("__ev") + expr(s"INTERVAL $windowHours HOURS"),
        col(tsCol))).over(w))
    val perUser = chained.groupBy(col(userCol))
      .agg(max(col("__ev")).as("__ev"), max(col("__cv")).as("__cv"))
      .filter(col("__ev").isNotNull)
      .select((col(userCol) % lit(2)).as("__variant"),
        col("__cv").isNotNull.cast("long").as("__conv"))
    perUser.agg(
        sum(when(col("__variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__variant") === 0, col("__conv")).otherwise(0L)).as("conv_a"),
        sum(when(col("__variant") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__variant") === 1, col("__conv")).otherwise(0L)).as("conv_b"))
      .select(col("n_a"), col("conv_a"),
        (col("conv_a").cast("double") / nullif(col("n_a"), lit(0L))).as("p_a"),
        col("n_b"), col("conv_b"),
        (col("conv_b").cast("double") / nullif(col("n_b"), lit(0L))).as("p_b"))
      .select(col("n_a"), col("conv_a"), col("p_a"),
        col("n_b"), col("conv_b"), col("p_b"),
        // pooled two-proportion z; every op correctly rounded, FIXED
        // association (the SQL oracle replays this exact expression tree)
        ((col("p_a") - col("p_b")) /
          sqrt((((col("conv_a") + col("conv_b")).cast("double") /
                 (col("n_a") + col("n_b"))) *
                (lit(1.0) - (col("conv_a") + col("conv_b")).cast("double") /
                 (col("n_a") + col("n_b")))) *
               (lit(1.0) / nullif(col("n_a"), lit(0L)) +
                lit(1.0) / nullif(col("n_b"), lit(0L)))))
          .as("z_score"))
      .withColumn("significant", abs(col("z_score")) > lit(1.96))
  }

  /**
   * Daily gap-fill with forward fill (the time-series resample primitive):
   * per-user daily `sum(value)` of `eventType` events, re-gridded onto a
   * complete day spine spanning each user's own [first, last] active day,
   * gaps carrying the last observed value forward.
   *
   * Output: (user_id, day 'yyyy-MM-dd' STRING, day_value DOUBLE — NULL on
   * gap days, filled_value DOUBLE, is_gap BOOLEAN). The daily sum
   * aggregates in DECIMAL(18,2) then casts to DOUBLE (the engine-wide
   * exact-sum convention), and the fill MOVES that value without
   * arithmetic, so results hash-reproduce across engines. Users with no
   * qualifying events produce no rows.
   */
  def gapFill(events: DataFrame, eventType: String = "purchase",
              userCol: String = "user_id", tsCol: String = "ts",
              typeCol: String = "event_type",
              valueCol: String = "value"): DataFrame = {
    val daily = events.filter(col(typeCol) === eventType)
      .groupBy(col(userCol).as("user_id"),
        col(tsCol).cast("date").as("__d"))
      .agg(expr(s"CAST(SUM(CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE)")
        .as("day_value"))
    // JOINLESS spine: each observed day OWNS the gap run up to (not
    // including) the user's next observed day — explode that run and the
    // forward fill falls out for free (the filled value only changes at
    // observed days). One scan, one (user, day) agg, one user window;
    // a spine-vs-daily join here would recompute `daily` (and re-scan
    // the event table) for its second consumer.
    val wd = Window.partitionBy("user_id").orderBy("__d")
    // An observed day whose SUM(value) is NULL (all-NULL inputs) is itself
    // a gap: the fill carries the last NON-NULL daily sum forward (ordered
    // window, default frame = unbounded preceding..current row — the same
    // `last_value IGNORE NULLS` the oracle uses), and is_gap mirrors
    // `day_value IS NULL`, not merely "day not observed".
    daily
      .withColumn("__next_d", lead(col("__d"), 1).over(wd))
      .withColumn("__ff", last(col("day_value"), ignoreNulls = true).over(wd))
      .select(col("user_id"), col("day_value").as("__obs"), col("__ff"),
        col("__d").as("__anchor"),
        explode(sequence(col("__d"),
          coalesce(date_sub(col("__next_d"), 1), col("__d")))).as("__d"))
      .select(col("user_id"),
        date_format(col("__d"), "yyyy-MM-dd").as("day"),
        when(col("__d") === col("__anchor"), col("__obs")).as("day_value"),
        col("__ff").as("filled_value"),
        (col("__d") =!= col("__anchor") || col("__obs").isNull).as("is_gap"))
  }

  /**
   * Cohort lifetime-value (LTV) curves — the revenue companion of
   * [[retention]]: for each weekly cohort and week offset, the cumulative
   * per-user revenue to date. Cohorts and offsets use the identical
   * integer epoch-week convention as [[retention]] (first-ever event pins
   * the cohort; offset 0 is the signup week, so `cohort_size` is the
   * offset-0 active count).
   *
   * Exactness: weekly revenue accumulates in DECIMAL(18,2) per cell, the
   * running total is a DECIMAL window sum over the CELL frame (exact at
   * any magnitude), and only the final per-user division happens in
   * doubles — one correctly-rounded divide mirrored by the oracle, so
   * results hash-reproduce across engines. Cells with active users but
   * no purchases contribute an exact 0.
   *
   * Scale shape: one user-hash exchange (the first-event window), one
   * (cohort, offset) aggregate with map-side partials, then windows over
   * the CELL frame only — rows = cohorts × offsets, bounded by calendar,
   * never by users or events. One event scan, zero joins.
   *
   * Output: (cohort_week BIGINT, week_offset BIGINT, n_active BIGINT,
   * cohort_size BIGINT, week_revenue DOUBLE, ltv_per_user DOUBLE).
   */
  def cohortLtv(events: DataFrame, revenueType: String = "purchase",
                userCol: String = "user_id", tsCol: String = "ts",
                typeCol: String = "event_type",
                valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(userCol)
    val ed = events.select(col(userCol).as("user_id"), col(typeCol).as("__t"),
        col(valueCol).as("__v"),
        datediff(col(tsCol).cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("__ed"))
      .withColumn("__first_ed", min(col("__ed")).over(w))
    val cells = ed
      .select(col("user_id"),
        expr("__first_ed div 7").as("cohort_week"),
        expr("(__ed - __first_ed) div 7").as("week_offset"),
        when(col("__t") === revenueType,
          expr("CAST(__v AS DECIMAL(18,2))")).as("__rev"))
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("user_id")).as("n_active"),
        coalesce(sum(col("__rev")), expr("CAST(0 AS DECIMAL(18,2))"))
          .as("__rev_dec"))
    val wc = Window.partitionBy("cohort_week")
    val wcum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(wc))
      .withColumn("__cum", sum(col("__rev_dec")).over(wcum))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        col("__rev_dec").cast("double").as("week_revenue"),
        (col("__cum").cast("double") / col("cohort_size")).as("ltv_per_user"))
  }

  /**
   * Last-touch marketing attribution: every conversion is credited to the
   * user's most recent touch event strictly before it (ties broken by the
   * unique event id), provided the touch happened within `windowHours` of
   * the conversion; conversions with no qualifying touch are credited to
   * the `(direct)` channel. The standard attribution readout next to
   * funnels and A/B tests.
   *
   * Joinless by construction: one user-hash exchange carries BOTH the
   * "which touch came last" question (an ordered window with
   * `last(..., ignoreNulls)` over ROWS UNBOUNDED PRECEDING..1 PRECEDING —
   * the carried state is one (type, ts) pair regardless of history
   * length) and the conversion filter; the channel aggregate is bounded
   * by the number of touch types, never by events. The deadline test is
   * exact integer microseconds (`unix_micros`), and the attributed value
   * follows the engine-wide exact-money convention (DECIMAL(18,2) sum
   * cast to DOUBLE), so results hash-reproduce across engines.
   *
   * Output: (channel STRING, conversions BIGINT, users BIGINT,
   * attributed_value DOUBLE), one row per credited channel.
   */
  def attribution(events: DataFrame,
                  touchTypes: Seq[String] = Seq("view", "click"),
                  convertType: String = "purchase",
                  windowHours: Int = 72,
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type",
                  valueCol: String = "value",
                  idCol: String = "event_id"): DataFrame = {
    require(!touchTypes.contains(convertType),
      s"convert type $convertType cannot also be a touch type")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(touchTypes.map(x => x: Any): _*)
    val winMicros = windowHours.toLong * 3600L * 1000000L
    events
      .withColumn("__tt", last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
      .withColumn("__tts", last(when(isTouch, col(tsCol)), ignoreNulls = true).over(w))
      .filter(col(typeCol) === convertType)
      .select(
        when(col("__tts").isNotNull &&
          unix_micros(col(tsCol)) - unix_micros(col("__tts")) <= winMicros,
          col("__tt")).otherwise("(direct)").as("channel"),
        col(userCol).as("__u"), col(valueCol).as("__v"))
      .groupBy("channel")
      .agg(count(lit(1)).as("conversions"),
        count_distinct(col("__u")).as("users"),
        expr("CAST(SUM(CAST(__v AS DECIMAL(18,2))) AS DOUBLE)")
          .as("attributed_value"))
  }

  /**
   * User-journey transition matrix: adjacent event-type bigrams per user
   * in (ts, event_id) order, counted across users — the Markov-chain /
   * Sankey view of product navigation. A transition only counts when the
   * next event follows within `maxGapHours` (exact integer-microsecond
   * test), so overnight returns don't read as in-session navigation.
   *
   * One user-hash exchange (the ordered `lead` window), then an aggregate
   * whose cardinality is bounded by |event types|² — never by events.
   * Output: (src_type, dst_type, n_transitions BIGINT, n_users BIGINT).
   */
  def transitions(events: DataFrame, maxGapHours: Int = 24,
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type",
                  idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val gapMicros = maxGapHours.toLong * 3600L * 1000000L
    events
      .withColumn("__nt", lead(col(typeCol), 1).over(w))
      .withColumn("__nts", lead(col(tsCol), 1).over(w))
      .filter(col("__nt").isNotNull &&
        unix_micros(col("__nts")) - unix_micros(col(tsCol)) <= gapMicros)
      .groupBy(col(typeCol).as("src_type"), col("__nt").as("dst_type"))
      .agg(count(lit(1)).as("n_transitions"),
        count_distinct(col(userCol)).as("n_users"))
  }

  /**
   * Weekly growth accounting (the new / retained / resurrected / churned
   * decomposition of an active-user curve). Weeks are epoch-day `div` 7 —
   * the same integer-bucket convention as [[retention]]. Per user per
   * active week:
   *
   *  - NEW          first-ever active week,
   *  - RETAINED     active the immediately preceding week too,
   *  - RESURRECTED  active before, but not the preceding week;
   *
   * and a user active in week w but not w+1 CHURNS in week w+1 (emitted
   * only while w+1 is inside the observed calendar — the data ending is
   * not churn). The accounting identity `active(w) = new + retained +
   * resurrected` holds by construction and is spec-pinned.
   *
   * Scale shape: one (user, week) aggregate, one user-ordered window over
   * the per-user WEEK rows (bounded by active weeks, not events), and a
   * final k-row aggregate. The calendar clip needs the global max active
   * week — computed with a global window over the ALREADY-AGGREGATED
   * k-row frame (rows = weeks, bounded by calendar), never via a second
   * scan of the event table or a broadcast join. One scan, zero joins.
   * All arithmetic is integer; counts are exact longs.
   *
   * Output: (week BIGINT, n_new, n_retained, n_resurrected, n_churned —
   * all BIGINT), one row per week with any activity or churn.
   */
  def growthAccounting(events: DataFrame,
                       userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val userWeeks = events
      .select(col(userCol).as("user_id"),
        expr(s"CAST(datediff(CAST($tsCol AS DATE), DATE '1970-01-01') AS BIGINT) div 7")
          .as("week"))
      .groupBy("user_id", "week").agg(count(lit(1)).as("__n")).drop("__n")
    val wAll = Window.partitionBy("user_id")
    val wOrd = Window.partitionBy("user_id").orderBy("week")
    val flagged = userWeeks
      .withColumn("__first", min(col("week")).over(wAll))
      .withColumn("__prev", lag(col("week"), 1).over(wOrd))
      .withColumn("__next", lead(col("week"), 1).over(wOrd))
    // one explode, not a union of two selects — Spark does not share a
    // subtree across union inputs, so the union form would run the whole
    // (user, week) pipeline twice. Churn is emitted UNCONDITIONALLY at
    // week+1 here and clipped after the aggregate (below), so no global
    // max-week value is needed at per-user granularity.
    val agged = flagged
      .select(explode(array(
        struct(col("week"),
          when(col("week") === col("__first"), lit("new"))
            .when(col("__prev") === col("week") - 1, lit("retained"))
            .otherwise(lit("resurrected")).as("__status")),
        struct(
          when(col("__next").isNull || col("__next") > col("week") + 1,
            col("week") + 1).as("week"),
          lit("churned").as("__status")))).as("__e"))
      .select(col("__e.week").as("week"), col("__e.__status").as("__status"))
      .filter(col("week").isNotNull)
      .groupBy("week")
      .agg(
        sum(when(col("__status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__status") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("__status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("__status") === "churned", 1L).otherwise(0L)).as("n_churned"))
    // clip at the observed calendar: the only churn row past the last
    // ACTIVE week is the spurious one at max+1 (the data ending is not
    // churn). The global window runs over the k-row weekly aggregate —
    // single-partition of |weeks| rows, bounded by calendar, safe at any
    // data scale.
    val wGlobal = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    agged
      .withColumn("__max_active",
        max(when(col("n_new") + col("n_retained") + col("n_resurrected") > 0,
          col("week"))).over(wGlobal))
      .filter(col("week") <= col("__max_active"))
      .drop("__max_active")
  }

  /**
   * Rolling z-score anomaly detection over a per-user event stream — the
   * metric-spike detector every telemetry pipeline runs before alerting.
   * An event is anomalous when its value deviates from the mean of the
   * user's previous `lookback` events of the same type by more than
   * `z` standard deviations (population variance of the trailing window).
   *
   * EXACT INTEGER FORM (the reason this hash-reproduces across engines):
   * floats never enter the test. With cents `x`, trailing count `n`,
   * trailing sum `S`, trailing sum-of-squares `Q`:
   *
   *   |x - S/n| > z * sqrt((nQ - S^2)/n^2)  <=>  (nx - S)^2 > z^2 (nQ - S^2)
   *
   * so the whole predicate is BIGINT arithmetic (bounds: cents <= ~6e6
   * at the data's value range, so every product stays far below 2^63).
   * A zero-variance window flags ANY deviation — the strictest consistent
   * reading, and deterministic.
   *
   * Scale shape: one user-hash exchange, one ordered window (ROWS frame —
   * bounded state per user regardless of history length), then a filter.
   * No joins, no driver state; identical shape at 100 TB.
   *
   * Output (anomalies only): user_id, event_id, cents, n_prev,
   * dev_sq = (nx-S)^2, var_scaled = z^2(nQ-S^2) — the two exact sides of
   * the comparison, auditable downstream.
   */
  def rollingAnomaly(events: DataFrame, eventType: String = "purchase",
                     lookback: Int = 10, minPrev: Int = 5,
                     zSquared: Int = 4,
                     userCol: String = "user_id", tsCol: String = "ts",
                     typeCol: String = "event_type",
                     valueCol: String = "value",
                     idCol: String = "event_id"): DataFrame = {
    // ts ties broken by the unique event id — the window is deterministic
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__ts"), col("event_id"))
      .rowsBetween(-lookback, -1)
    events.filter(col(typeCol) === eventType)
      .select(col(userCol).as("user_id"), col(idCol).as("event_id"),
        col(tsCol).as("__ts"),
        // engine-wide exact-money convention: DECIMAL(18,2) then integer cents
        expr(s"CAST(CAST($valueCol AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cents"))
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("s_prev", sum(col("cents")).over(w))
      .withColumn("q_prev", sum(col("cents") * col("cents")).over(w))
      .filter(col("n_prev") >= minPrev)
      .withColumn("__dev", col("n_prev") * col("cents") - col("s_prev"))
      .select(col("user_id"), col("event_id"), col("cents"), col("n_prev"),
        (col("__dev") * col("__dev")).as("dev_sq"),
        (lit(zSquared.toLong) *
          (col("n_prev") * col("q_prev") - col("s_prev") * col("s_prev")))
          .as("var_scaled"))
      .filter(col("dev_sq") > col("var_scaled"))
  }

  /**
   * Type-2 slowly-changing-dimension build from a change-event stream:
   * per key, collapse consecutive equal attribute readings into versions
   * and emit each version's validity interval
   * `[valid_from, valid_to)` (`valid_to` NULL on the open current
   * version), a 1-based `version` sequence, and an `is_current` flag —
   * the standard warehouse dimension a CDC feed materializes into.
   *
   * Change detection is null-safe (`<=>`): a key's FIRST reading always
   * opens version 1, and a genuine NULL attribute following a non-NULL
   * one (or vice versa) is a change. Ties on the event timestamp break
   * on the unique event id, so versioning is deterministic for any
   * input order.
   *
   * Scale shape: ONE hash exchange on the key. Both windows (the
   * change-detect lag and the interval lead / version number) use the
   * same `PARTITION BY key ORDER BY (ts, id)`, and the filter between
   * them preserves partitioning and order, so Catalyst plans a single
   * exchange + sort with no re-shuffle. Rows carry (key, attr, ts, id)
   * only; output is |versions| rows, bounded by the number of actual
   * attribute changes, not |events|.
   */
  def scd2(events: DataFrame, eventType: String,
           keyCol: String = "user_id", attrCol: String = "value",
           tsCol: String = "ts", idCol: String = "event_id",
           typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    events.filter(col(typeCol) === eventType)
      .select(col(keyCol), col(attrCol), col(tsCol), col(idCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col(attrCol) <=> col("__prev")))
      .select(col(keyCol), col(attrCol).as("attr"),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(w).as("valid_to"),
        row_number().over(w).cast("long").as("version"))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
