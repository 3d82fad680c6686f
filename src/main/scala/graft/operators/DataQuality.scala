package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Data-quality audit — the admission gate a training-data pipeline runs
 * before ingesting a table: completeness (null counts on key columns),
 * domain constraints (value ranges), and referential integrity (orphan
 * foreign keys), emitted as ONE summary row.
 *
 * Scale shape: all completeness/domain checks ride a single aggregate
 * scan (map-side partial aggregation, no shuffle beyond the 1-row
 * final); the referential check is one anti join keyed on the foreign
 * key — the only data-sized shuffle, and skippable when the dimension
 * side fits a broadcast.
 */
object DataQuality {

  /** Audit of the `orders` fact table against the `customer` dimension. */
  def auditOrders(orders: DataFrame, customers: DataFrame): DataFrame = {
    val checks = orders.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("null_orderdate"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpositive_totalprice"))
    val orphans = orders
      .join(customers.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_orders"))
    checks.crossJoin(orphans)
  }

  /**
   * Per-group robust outlier detection (the median/MAD "Hampel filter"
   * family): flags rows whose integer metric deviates from their GROUP's
   * median by more than `nMads` median-absolute-deviations — the
   * distribution-drift detector a corpus pipeline runs per source / shard
   * / ingest day, robust exactly where mean/stddev fail (both get dragged
   * by the outliers being hunted; one 10M-token document moves a source's
   * mean, not its median).
   *
   * Medians are EXACT and computed by WINDOW SORT — per group: row_number
   * over the metric order plus a partition count, then average the middle
   * pair. Never Spark's exact `percentile` aggregate (its buffer
   * materializes every group's values in executor memory — the 100 TB
   * hazard) and never approx_percentile (not hash-reproducible). On
   * integer metrics every derived value — median (= (lo+hi)/2), absolute
   * deviation, MAD, the `nMads * mad` threshold — is an exactly
   * representable double, so the output hashes bit-for-bit across
   * engines.
   *
   * Scale shape: ONE corpus scan and ONE shuffle. All four window layers
   * (metric rank, middle-pair pick, deviation rank, MAD pick) share the
   * same `groupCol` partitioning, so Catalyst stacks them over a single
   * exchange — a join-back formulation would rescan the input once per
   * statistics table instead (four scans, measured). Window sorts spill;
   * per-group state never lives in RAM (the reason this is window-sort
   * and not Spark's exact `percentile` aggregate, whose buffer
   * materializes every group's values in executor memory).
   */
  def robustOutliers(df: DataFrame, metricCol: String, groupCol: String,
                     idCol: String, nMads: Double = 3.0): DataFrame = {
    require(nMads > 0, s"nMads ($nMads) must be positive")
    val wg = Window.partitionBy("grp")
    // middle-pair window median: lo = value at row (cnt+1) div 2, hi = at
    // cnt div 2 + 1 (equal when cnt is odd), each lifted to the whole
    // partition by a MAX over the single matching row
    def withMedian(in: DataFrame, valueCol: String, outCol: String): DataFrame =
      in.withColumn("__rn",
          row_number().over(wg.orderBy(col(valueCol), col("id"))))
        .withColumn("__cnt", count(lit(1)).over(wg))
        .withColumn("__lo",
          max(when(col("__rn") === expr("(__cnt + 1) div 2"), col(valueCol))).over(wg))
        .withColumn("__hi",
          max(when(col("__rn") === expr("__cnt div 2 + 1"), col(valueCol))).over(wg))
        .withColumn(outCol, (col("__lo") + col("__hi")).cast("double") / lit(2.0))
        .drop("__rn", "__cnt", "__lo", "__hi")
    val base = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
      col(metricCol).cast("long").as("m"))
    val withDev = withMedian(base, "m", "med")
      .withColumn("dev", abs(col("m").cast("double") - col("med")))
    withMedian(withDev, "dev", "mad")
      .select(col("id").as(idCol), col("grp").as(groupCol),
        col("m").as(metricCol), col("med"), col("mad"),
        (col("dev") > lit(nMads) * col("mad")).as("is_outlier"))
  }

  /**
   * k-anonymity audit: group the table by its quasi-identifier columns
   * and flag every cell whose distinct-subject count is below `k` — the
   * re-identification risk check a privacy review runs before releasing
   * event data or training on user-derived text (Sweeney 2002; a cell
   * with < k subjects pins its members down to a small candidate set).
   *
   * Exact distinct counts (no sketch): an at_risk verdict must not be
   * probabilistic. Scale shape: Catalyst plans exact count-distinct as
   * the two-phase Expand aggregate — partial per (cell, subject), final
   * per cell — so the only shuffle carries (quasi..., subject) narrow
   * rows, and the output is |cells| rows, bounded by the quasi-identifier
   * domain, never by |rows|.
   *
   * Output: one row per cell — (quasi columns..., n_subjects, n_rows,
   * at_risk = 0 < n_subjects < k).
   */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[(String, org.apache.spark.sql.Column)],
                      subject: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    require(quasi.nonEmpty, "at least one quasi-identifier column")
    df.groupBy(quasi.map { case (n, c) => c.as(n) }: _*)
      .agg(count_distinct(subject).as("n_subjects"),
        count(lit(1)).as("n_rows"))
      .withColumn("at_risk", col("n_subjects") < k)
  }

  /**
   * k-anonymity ENFORCEMENT — the act [[kAnonymityAudit]] only measures:
   * publish every row at the LOWEST generalization-ladder level whose
   * (generalized) cell reaches `k` distinct subjects, suppressing the
   * remainder (global-recoding-on-the-residual, the standard ladder form
   * of Sweeney 2002 / Samarati 2001 generalization).
   *
   * `ladder` is an ordered list of generalization LEVELS, each a full set
   * of quasi-identifier expressions sharing the same column names —
   * level 0 the exact values, each later level coarser (day -> month ->
   * '*'). Semantics, level by level over the RESIDUAL:
   *
   *   1. census the residual's level-`i` cells; cells with
   *      >= k distinct subjects PUBLISH their rows at level `i`
   *      (`gen_level = i`, quasi columns carry the level-`i` values);
   *   2. the rest continue to level `i+1`;
   *   3. rows surviving every level are SUPPRESSED:
   *      `gen_level = ladder.size`, every quasi value `'*'`.
   *
   * The PUBLISHED levels (gen_level < ladder.size) always re-audit clean
   * on (gen_level, quasi...) — levels partition the rows and each
   * published level's cells reached k by construction. The suppressed
   * partition (gen_level = ladder.size) never passed a k check: a
   * residual with fewer than k distinct subjects still emits its all-'*'
   * cell, which is exempt by construction — every quasi value is the
   * constant '*', so the cell carries zero linkage information (it is
   * the "no release" row, kept so row counts reconcile).
   * The stronger quasi-only re-audit (what the spec pins on the events
   * ladder) additionally requires that no two levels can emit the same
   * cell values, which holds when level formats differ ('2024-01-05' vs
   * '2024-01' vs '*') AND the data itself cannot produce the '*' /
   * '<NULL>' sentinels as real values — a quasi domain containing a
   * literal '*' should audit with gen_level included. Suppression is
   * minimal FOR THE LADDER: a row is suppressed only when no level's
   * residual cell reached k.
   *
   * NULL quasi values are canonicalized to the string `'<NULL>'` before
   * anything groups or joins (a NULL key would silently fall out of the
   * publish equi-joins and over-suppress); quasi outputs are strings for
   * the same reason the audit formats its day column — one stable dtype
   * across engines and levels.
   *
   * Scale shape: one narrow projection of (id, subject, per-level quasi
   * strings), localCheckpointed once; then `ladder.size` passes, each a
   * census-sized aggregate broadcast back as a publish/continue split.
   * The residual is re-checkpointed per level so the census+publish+anti
   * consumers share one materialization instead of recomputing a
   * 3-way-branching lineage. When the census broadcasts, row payloads
   * shuffle ZERO times — both joins are broadcast.
   *
   * The census is usually bounded by the quasi domain — but not
   * intrinsically: a high-cardinality level-0 ladder (exact values) with
   * small k can pass up to |subjects|/k cells, i.e. a data-sized frame.
   * A forced `broadcast()` hint would then OOM the driver at 100 TB, so
   * the hint is GATED: the checkpointed census is counted (a metadata
   * read, it is already materialized) and the hint applies only when the
   * level's passing-cell count is <= `maxBroadcastCells`; above the
   * bound both joins fall back to plain equi-joins — AQE still picks a
   * broadcast at runtime when the frame genuinely fits, and otherwise
   * the shuffle is the correct plan. With `checkpoint = false` (the
   * plan-inspection mode, fixture-sized inputs) the census is not
   * materialized, so counting it would recompute the aggregate per
   * level; that mode keeps the unconditional hint.
   *
   * Output: (idName, subjectName, gen_level, quasi columns...).
   */
  def kAnonymityEnforce(df: DataFrame,
                        id: (String, org.apache.spark.sql.Column),
                        subject: (String, org.apache.spark.sql.Column),
                        k: Int,
                        ladder: Seq[Seq[(String, org.apache.spark.sql.Column)]],
                        checkpoint: Boolean = true,
                        maxBroadcastCells: Long = 4L * 1000 * 1000): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    require(ladder.nonEmpty, "at least one generalization level")
    val names = ladder.head.map(_._1)
    require(ladder.forall(_.map(_._1) == names),
      s"every ladder level must generalize the same quasi columns $names")
    val proj0 = df.select(
      Seq(id._2.as("__id"), subject._2.as("__subj")) ++
        ladder.zipWithIndex.flatMap { case (lvl, i) =>
          lvl.map { case (n, c) =>
            coalesce(c.cast("string"), lit("<NULL>")).as(s"__q${i}_$n")
          }
        }: _*)
    val proj = if (checkpoint) proj0.localCheckpoint() else proj0
    var residual = proj
    val published = ladder.indices.map { i =>
      val keys = names.map(n => s"__q${i}_$n")
      // the census feeds TWO consumers (the publish join and the residual
      // anti join) that materialize at different times — checkpoint the
      // census-sized frame so the count_distinct aggregate runs once per
      // level, not once per consumer
      val cells0 = residual.groupBy(keys.map(col): _*)
        .agg(count_distinct(col("__subj")).as("__ns"))
        .filter(col("__ns") >= k)
        .drop("__ns")
      val cells = if (checkpoint) cells0.localCheckpoint() else cells0
      // broadcast only under the cell bound (see scaladoc): the
      // checkpointed census is already materialized, so count() is cheap
      val cellsSide =
        if (!checkpoint || cells.count() <= maxBroadcastCells) broadcast(cells)
        else cells
      val pub = residual.join(cellsSide, keys)
        .select(Seq(col("__id"), col("__subj"),
          lit(i.toLong).as("gen_level")) ++
          names.map(n => col(s"__q${i}_$n").as(n)): _*)
      val residual0 = residual.join(cellsSide, keys, "left_anti")
      residual = if (checkpoint) residual0.localCheckpoint() else residual0
      pub
    }
    val suppressed = residual
      .select(Seq(col("__id"), col("__subj"),
        lit(ladder.size.toLong).as("gen_level")) ++
        names.map(n => lit("*").as(n)): _*)
    (published :+ suppressed).reduce(_.unionByName(_))
      .withColumnRenamed("__id", id._1)
      .withColumnRenamed("__subj", subject._1)
  }
}
