package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys — the explicit fallback when AQE's
 * runtime skew-join split can't apply (e.g. the skewed side feeds a
 * co-partitioned window, or the join is buried under an operator AQE won't
 * re-plan).
 *
 * The hot side's key k becomes (k, salt) with salt ∈ [0, buckets); the other
 * side replicates each row `buckets` times, one per salt value, via a
 * posexplode of a constant range. The shuffled partitions for a hot key then
 * spread over `buckets` reducers instead of one. Replication multiplies the
 * small side by `buckets`, so pick buckets ≈ (hot-key rows) / (rows per
 * healthy partition) and keep the replicated side the dimension side.
 *
 * Join semantics preserved: inner and left-outer on the big side (every big
 * row keeps exactly its original matches; the salt column is internal).
 */
object SkewJoin {

  /** Deterministic row salt: xxhash64 over the row's own columns, folded
    * into [0, buckets). A salt derived from `spark_partition_id() +
    * monotonically_increasing_id()` (the r16 form) changes across task
    * retries and input repartitions — semantically harmless here (the salt
    * is internal and dropped), but off-contract for an engine that pins
    * determinism everywhere else. Hashing the row CONTENT makes the salt a
    * pure function of the data: retries, AQE re-plans, and layout changes
    * all reproduce it. Duplicate rows share a bucket by construction —
    * skew relief comes from distinct payloads, which is what a genuinely
    * hot key carries. */
  private def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(buckets.toLong)).cast("int")

  /** Inner/left salted equi-join of `big` (skewed) with `small` on
    * `bigKey === smallKey`. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salted join preserves semantics for inner/left only, got $joinType")
    require(buckets > 0)
    val saltedBig = big.withColumn("__salt", rowSalt(big, buckets))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Two-phase (salted partial -> final) aggregation for skewed group keys
    * where the aggregate is algebraic. Spark's hash aggregate already does
    * map-side partial aggregation; this helper exists for the FINAL-stage
    * skew case — a reducer key so hot its single final partition still
    * dominates — by inserting an intermediate reduction over (key, salt). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                buckets: Int): DataFrame = {
    df.withColumn("__salt", rowSalt(df, buckets))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"), sum(col("__n")).as("n_rows"))
  }

  /** Heuristic hot-key report: keys holding more than `threshold` of the
    * rows of an average key (driver-side diagnostic for choosing buckets). */
  def hotKeys(df: DataFrame, key: String, threshold: Double = 10.0): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val avg = counts.agg(expr("avg(n)")).first().getDouble(0)
    counts.filter(col("n") > lit(avg * threshold)).orderBy(col("n").desc)
  }
}
