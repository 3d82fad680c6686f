package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet table loaders for the driver testdata
 * (/root/testdata/sf{0.001,0.01,0.1}/ — see TESTDATA.md / FIXTURES.md).
 *
 * The one non-trivial source: `events.ts` is parquet TIMESTAMP(NANOS), which
 * Spark's parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read
 * nanos as raw longs (`spark.sql.legacy.parquet.nanosAsLong`) and floor-divide
 * to microseconds — exactly the truncation DuckDB applies when it casts its
 * TIMESTAMP_NS to its µs-native TIMESTAMP, so oracle comparisons line up to
 * the microsecond.
 */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` converted ns→µs timestamp (floor, matching DuckDB). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
