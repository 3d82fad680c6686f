package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Point-in-time (as-of) join: each left row picks the most recent right row
 * with `rightTime <= leftTime` for the same key — THE correctness primitive
 * for ML feature pipelines (no feature leakage from the future).
 *
 * Spark has no native as-of join; the scalable construction is the
 * union-window form:
 *
 *   1. tag both inputs and union them on (key, time) — right rows sort
 *      before left rows at equal times (inclusive `<=` semantics);
 *   2. one window per key ordered by (time, side, tiebreak) carries the
 *      last non-null right payload forward (`last(..., ignoreNulls)` over
 *      ROWS UNBOUNDED PRECEDING);
 *   3. keep the left rows; a left row with no prior right row gets nulls
 *      (left-outer as-of).
 *
 * Cost: ONE shuffle of |L|+|R| narrow rows on the key plus a per-key sort —
 * the same exchange profile as a sort-merge join, with no range explosion.
 * Skewed keys follow the usual salting/AQE mitigations; the window state is
 * one payload struct per partition.
 *
 * Right rows tied on (key, time) are ordered by `rightTiebreak` and the
 * LAST one wins — pass a unique column for fully deterministic output.
 */
object AsofJoin {

  /** Backward as-of (default): most recent right row with
    * `rightTime <= leftTime`; ties on (key, time) resolved by the LARGEST
    * `rightTiebreak`. */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightVals: Seq[String], rightTiebreak: String): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      rightVals, rightTiebreak, forward = false)

  /** FORWARD as-of: each left row picks the EARLIEST right row with
    * `rightTime >= leftTime` for the same key — the label-generation
    * primitive (time-to-next-event, next-purchase lookahead) that is the
    * mirror of the backward feature join. Same one-shuffle union-window
    * construction with the per-key sort descending; ties on (key, time)
    * resolved by the SMALLEST `rightTiebreak`. */
  def asofForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: String, rightTime: String,
                  rightVals: Seq[String], rightTiebreak: String): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      rightVals, rightTiebreak, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       rightVals: Seq[String], rightTiebreak: String,
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = StructType(right.select(rightVals.map(col): _*).schema.fields)
    val meta = Seq("__key", "__time", "__side", "__tb", "__payload")

    // the tiebreak keeps its NATIVE type: casting to string would order
    // numeric tiebreaks lexicographically ("10" < "9"), silently breaking
    // the LARGEST/SMALLEST-tiebreak contract for the common unique-id case
    val tbType = right.schema(rightTiebreak).dataType
    val lTagged = left
      .withColumn("__key", col(leftKey))
      .withColumn("__time", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(tbType))
      .withColumn("__payload", lit(null).cast(payloadType))
      .select((leftCols ++ meta).map(col): _*)

    val rTagged = leftCols.foldLeft(
        right
          .withColumn("__key", col(rightKey))
          .withColumn("__time", col(rightTime))
          .withColumn("__side", lit(0))
          .withColumn("__tb", col(rightTiebreak))
          .withColumn("__payload", struct(rightVals.map(col): _*))
          .select(meta.map(col): _*)
      )((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((leftCols ++ meta).map(col): _*)

    // forward mirrors the backward sort: time DESC walks from the future
    // toward each left row, right rows (side 0) still sort before left rows
    // at equal times (inclusive semantics), and __tb DESC makes the LAST
    // right row seen — the one `last(ignoreNulls)` keeps — the smallest
    // tiebreak (earliest winner)
    val w = (
      if (forward)
        Window.partitionBy(col("__key"))
          .orderBy(col("__time").desc, col("__side").asc, col("__tb").desc_nulls_last)
      else
        Window.partitionBy(col("__key"))
          .orderBy(col("__time").asc, col("__side").asc, col("__tb").asc_nulls_last)
    ).rowsBetween(Window.unboundedPreceding, 0)

    lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(v => col(s"__asof.$v").as(s"asof_$v")): _*)
  }
}
