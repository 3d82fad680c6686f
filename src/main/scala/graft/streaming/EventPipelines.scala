package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType
import graft.functions.heavy_hitters

/**
 * Structured-Streaming surface over the `events` table (SURVEY.md §2.9/§7.5).
 * The reference has no streaming; these are the extension operators a
 * large-scale pipeline needs, written so the SAME aggregation logic runs in
 * batch (DuckDB-oracle-able) and as an incremental streaming query with
 * watermarked state.
 */
object EventPipelines {

  /** Tumbling-window counts/sums per event_type — batch form (equals the
    * streaming result after all data is processed). */
  def tumblingBatch(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** The unterminated streaming tumbling aggregation (no sink): callers
    * attach a memory sink in Complete mode ([[tumblingStreaming]]) or an
    * append-mode file sink with a checkpoint — the production shape, where
    * a window row is emitted exactly once, when the watermark passes its
    * end (and the recovery-test shape: the watermark and window state live
    * in the checkpoint). */
  def tumblingStream(spark: SparkSession, sourceDir: String,
                     width: String = "1 hour",
                     watermark: String = "2 hours",
                     schema: Option[StructType] = None): DataFrame = {
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Same aggregation as an incremental streaming query with a watermark
    * bounding state. Returns the started query's result via the memory sink. */
  def tumblingStreaming(spark: SparkSession, sourceDir: String,
                        width: String = "1 hour", watermark: String = "2 hours",
                        queryName: String = "events_tumbling",
                        schema: Option[StructType] = None): DataFrame = {
    val q = tumblingStream(spark, sourceDir, width, watermark, schema).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming exact dedup on an id column: state is bounded by the
    * watermark via dropDuplicatesWithinWatermark (a duplicate arriving
    * later than the watermark delay may pass — the documented tradeoff
    * that keeps dedup state finite on an unbounded stream). */
  def dedupStreaming(spark: SparkSession, sourceDir: String,
                     idCols: Seq[String], watermark: String = "2 hours",
                     queryName: String = "events_dedup",
                     schema: Option[StructType] = None): DataFrame = {
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val stream = spark.readStream.schema(srcSchema).parquet(sourceDir)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Tumbling-window frequent-user census per event_type — batch form.
    * The Misra-Gries `heavy_hitters` aggregate reduces each map task to at
    * most k counters before the exchange, so the shuffle carries
    * O(windows × types × k) summary state instead of per-user counts;
    * [[graft.functions.HeavyHittersAgg]] documents the underestimate /
    * n-over-(k+1) / coverage theorems that hold for ANY merge order. */
  def heavyUsersBatch(events: DataFrame, width: String = "1 hour",
                      k: Int = 8): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(heavy_hitters(col("user_id").cast("string"), k).as("frequent_users"),
           count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("frequent_users"), col("n_events"))

  /**
   * The same census as an incremental streaming query — the case a
   * MERGEABLE sketch exists for: the state store keeps one serialized MG
   * summary per (window, event_type) group and each micro-batch's partial
   * summaries MERGE into it, so streaming state is bounded at
   * O(live windows × types × k) counters regardless of how many distinct
   * users the stream carries. The exact census would hold per-user state —
   * unbounded on a 100 TB stream — and the mergeable-summaries theorem
   * (PODS 2012) is precisely what makes the incremental merge sequence
   * (batch 1 ⊕ batch 2 ⊕ …) carry the same n/(k+1) error contract as any
   * batch merge tree over the identical data. With k at or above the
   * per-group distinct-user count the summary never evicts, every estimate
   * is exact, and stream output EQUALS batch output bit-for-bit
   * (EventPipelinesSpec pins both regimes).
   */
  /** The unterminated streaming census (no sink): callers attach a memory
    * sink in Complete mode ([[heavyUsersStreaming]]) or an append-mode file
    * sink with a checkpoint — the production shape, where a window's final
    * summary is emitted exactly once when the watermark passes its end, and
    * the serialized MG state lives in the checkpoint across restarts
    * (EventPipelinesSpec pins the recovery). */
  def heavyUsersStream(spark: SparkSession, sourceDir: String,
                       width: String = "1 hour", watermark: String = "2 hours",
                       k: Int = 8, maxFilesPerTrigger: Int = 0,
                       schema: Option[StructType] = None): DataFrame = {
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    // maxFilesPerTrigger > 0 forces MULTIPLE micro-batches even under
    // AvailableNow — the spec uses it so the state-merge path (summary ⊕
    // summary, not just one batch's partials) is genuinely exercised
    val reader0 = spark.readStream.schema(srcSchema)
    val reader = if (maxFilesPerTrigger > 0)
      reader0.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader0
    reader.parquet(sourceDir)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(heavy_hitters(col("user_id").cast("string"), k).as("frequent_users"),
           count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("frequent_users"), col("n_events"))
  }

  def heavyUsersStreaming(spark: SparkSession, sourceDir: String,
                          width: String = "1 hour", watermark: String = "2 hours",
                          k: Int = 8,
                          queryName: String = "events_heavy_users",
                          maxFilesPerTrigger: Int = 0,
                          schema: Option[StructType] = None): DataFrame = {
    val agg = heavyUsersStream(spark, sourceDir, width, watermark, k,
      maxFilesPerTrigger, schema)
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Sliding-window per-type event rates (batch). */
  def slidingBatch(events: DataFrame, width: String = "1 hour",
                   slide: String = "30 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"))

  /**
   * Sessionization with an inactivity gap — batch form via window functions
   * (lag -> new-session flag -> running sum as session id). One shuffle on
   * user_id; the same semantics stream via session_window.
   */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val flagged = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // gap in exact MICROSECONDS with session_window's closing rule
      // (next event merges iff it falls INSIDE [prev, prev + gap), so a
      // session closes at diff >= gap): unix_timestamp truncates each side
      // to whole seconds, which both loses sub-second gap components (the
      // events table is µs-precision) and mis-places the boundary the
      // streaming form decides exactly
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) >=
            gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"),
           expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
  }

  /**
   * STREAM-STREAM interval join: every event joined to the error events of
   * the same user within the preceding `windowSpec` — the incremental form
   * of [[graft.operators.RangeJoin.pointInInterval]] (the `ev_range_join`
   * batch query; EventPipelinesSpec pins stream == batch).
   *
   * Both sides carry a watermark and the join condition time-bounds one
   * side against the other (`ts` within [e_ts, e_ts + window)), which is
   * exactly what lets Spark evict joint state: an error row can be dropped
   * once the point-side watermark passes `e_ts + window`, so state stays
   * bounded on an unbounded stream — the stream-stream analogue of the
   * windowed-aggregation watermark contract.
   */
  def intervalJoinStreaming(spark: SparkSession, sourceDir: String,
                            windowSpec: String = "1 hour",
                            watermark: String = "2 hours",
                            queryName: String = "events_interval_join",
                            schema: Option[StructType] = None): DataFrame = {
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val points = spark.readStream.schema(srcSchema).parquet(sourceDir)
      .select(col("event_id"), col("user_id"), col("ts"))
      .withWatermark("ts", watermark)
    val errors = spark.readStream.schema(srcSchema).parquet(sourceDir)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    val joined = points.join(errors,
      expr(s"user_id = e_user AND ts >= e_ts AND ts < e_ts + INTERVAL $windowSpec"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("error_id").as("ivl_error_id"))
    val q = joined.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming sessionization via the native session_window (state bounded
    * by the watermark). */
  def sessionizeStreaming(spark: SparkSession, sourceDir: String,
                          gap: String = "30 minutes", watermark: String = "2 hours",
                          queryName: String = "events_sessions",
                          schema: Option[StructType] = None): DataFrame = {
    val srcSchema = resolveSourceSchema(spark, sourceDir, schema)
    val stream = spark.readStream.schema(srcSchema).parquet(sourceDir)
    val agg = stream
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
    val q = agg.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
