package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/**
 * Parquet table loaders for the driver testdata
 * (/root/testdata/sf{0.001,0.01,0.1}/ — see TESTDATA.md / FIXTURES.md).
 *
 * The one non-trivial source: `events.ts` arrives in whatever physical
 * encoding the generator last used, and the two observed encodings need
 * different handling:
 *
 *  - parquet TIMESTAMP(NANOS): Spark's parquet reader rejects it outright
 *    ([PARQUET_TYPE_ILLEGAL]) unless nanos are surfaced as raw longs
 *    (`spark.sql.legacy.parquet.nanosAsLong`), which we then floor-divide to
 *    microseconds — exactly the truncation DuckDB applies casting its
 *    TIMESTAMP_NS to the µs-native TIMESTAMP, so oracles line up to the µs.
 *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): reads natively as
 *    TIMESTAMP_NTZ. We cast to the session-local TimestampType (session TZ
 *    is pinned to UTC everywhere in this engine, so the instant is
 *    unchanged) to keep one downstream type for windows, watermarks and
 *    oracle dumps regardless of which encoding the generator produced.
 *
 * Branching on the READ schema (not on a config) makes the loader
 * encoding-agnostic: the driver regenerated the testdata between rounds
 * with a different writer, and nothing downstream should care.
 */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` normalized to µs TimestampType (floor, matching DuckDB). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw // already µs TimestampType
    }
  }
}
