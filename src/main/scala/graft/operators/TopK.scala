package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-group top-k — the relational form of the reference's
 * `sort_values(...).head(k)`-per-username loop (/root/reference/main.py:169).
 *
 * Implemented as a rank-limit window so Spark's `WindowGroupLimit` rewrite
 * (InferWindowGroupLimit) applies: each map task keeps a bounded per-group
 * heap and emits at most k rows per group BEFORE the shuffle, which is the
 * property that makes this survive a 100 TB input — the exchange carries
 * O(groups*k) rows, not O(input).
 */
object TopK {

  /** Rows with `row_number() <= k` per group, ordered by `order`.
    * Always pass a deterministic total order (add a tiebreak column). */
  def topK(df: DataFrame, k: Int, partitionBy: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(partitionBy: _*).orderBy(order: _*)))
      .filter(col("rn") <= k)

  /** Global top-k: `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject
    * (per-partition heap + single reduce), no full sort. */
  def globalTopK(df: DataFrame, k: Int, order: Seq[Column]): DataFrame =
    df.orderBy(order: _*).limit(k)
}
