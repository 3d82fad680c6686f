package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers: pre-shuffle a table ONCE at write time so every
 * subsequent equi-join/aggregation on the bucket key runs with NO exchange —
 * the amortization that matters when a 100 TB fact table is joined daily.
 *
 * Spark buckets only via the catalog (`saveAsTable`); plain
 * `write.parquet(path)` silently drops bucket metadata. Both sides of a join
 * must bucket on the join key with the SAME bucket count (or a divisor, with
 * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`) for the exchange to
 * disappear. BucketingSpec pins the no-Exchange plan shape.
 */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) catalog table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys — planned without a
    * shuffle on either side when bucket layouts line up. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
