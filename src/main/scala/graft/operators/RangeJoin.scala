package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Bucketized range join: match points `t` into intervals `[start, end)`
 * sharing a key, without the nested-loop plan Spark produces for non-equi
 * joins (BroadcastNestedLoopJoin — only viable when one side broadcasts).
 *
 * Construction: quantize the time axis into `binSeconds` bins; each interval
 * explodes to the bins it covers, each point maps to its single bin, and the
 * match becomes an EQUI-join on (key, bin) plus the exact range filter.
 * Because a point lives in exactly one bin, a (point, interval) pair can
 * meet in at most one bin — the join is duplicate-free by construction, no
 * distinct needed.
 *
 * Scale: one hash shuffle per side on (key, bin). Interval replication is
 * ceil(len/binSeconds)+1 rows; pick `binSeconds` near the typical interval
 * length so replication stays O(1) while bins stay selective. Degenerate
 * long intervals replicate proportionally — split those upstream or raise
 * the bin width.
 */
object RangeJoin {

  /** Points joined to the intervals containing them. Output: all point
    * columns plus `intervalVals` columns prefixed `ivl_`. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointKey: String, intervalKey: String,
                      pointTime: String, intervalStart: String, intervalEnd: String,
                      intervalVals: Seq[String], binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    val p = points
      .withColumn("__key", col(pointKey))
      .withColumn("__bin", expr(s"unix_micros($pointTime) div $binUs"))
    // guard BEFORE the explode: `sequence(hi, lo)` DESCENDS, so one
    // malformed interval (end <= start, e.g. an epoch-zero sentinel end)
    // would replicate into millions of junk bins that the exact range
    // filter then discards — pure blast radius. An empty [s, e) interval
    // can match nothing, so dropping it here changes no results.
    val i = intervals
      .filter(col(intervalEnd) > col(intervalStart))
      .withColumn("__key", col(intervalKey))
      .withColumn("__bin", explode(sequence(
        expr(s"unix_micros($intervalStart) div $binUs"),
        expr(s"unix_micros($intervalEnd - INTERVAL 1 MICROSECOND) div $binUs"))))
      .select(Seq(col("__key"), col("__bin"), col(intervalStart), col(intervalEnd)) ++
        intervalVals.map(v => col(v).as(s"ivl_$v")): _*)
    p.join(i, Seq("__key", "__bin"))
      .filter(col(pointTime) >= col(intervalStart) && col(pointTime) < col(intervalEnd))
      .drop("__key", "__bin", intervalStart, intervalEnd)
  }
}
