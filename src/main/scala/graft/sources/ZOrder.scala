package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{zorder_key, zorder_key_n}

/**
 * Z-order (Morton) clustered layout — multi-dimensional data skipping for
 * parquet scans. A table linearly sorted on column A prunes predicates on
 * A but scatters B across every file; sorting on the bit-interleaved
 * [[graft.functions.ZOrderKey]] of (A, B) clusters BOTH dimensions, so a
 * 2-d box predicate `A BETWEEN .. AND B BETWEEN ..` skips most files /
 * row groups on min-max stats alone — the standard lakehouse layout move
 * (Delta OPTIMIZE ZORDER, Iceberg sort orders) expressed with plain Spark:
 * a rank-normalizing projection, one range exchange on the z-key, and a
 * within-partition sort.
 *
 * Dimension values must be non-negative and fit `bits` bits for the key to
 * respect locality, so [[writeZOrdered]] first RANK-normalizes each
 * dimension onto [0, 2^bits) quantiles (`ntile`) — the same move the
 * production implementations make (Delta uses range-partition ids), which
 * also makes the layout robust to skew and to arbitrary orderable types.
 * ZOrderSpec pins the file-level min-max evidence: a 2-d box over the
 * z-ordered layout admits strictly fewer files than over the linear sort.
 *
 * Scale note: `ntile` over a global window would single-task at 100 TB;
 * the rank normalization here uses `percent_rank`-free ntile ONLY for the
 * key build — computed per dimension with a window over a RANGE-partitioned
 * frame would still serialize, so the implementation quantizes against
 * driver-collected approx-quantile cut points (dimension-sized: 2^bits
 * values per column), keeping the heavy pass one exchange + local sort.
 */
object ZOrderLayout {

  /** Quantize `c` onto [0, nBuckets) against pre-computed ascending cut
    * points: the count of cuts strictly below the value (clamped), as one
    * scan-local filter over the literal cut array — a single compact HOF,
    * not 2^bits nested CASE branches. */
  private def bucketize(c: Column, cuts: Array[Double], n: Int): Column =
    least(size(filter(typedLit(cuts), x => x < c)).cast("long"), lit((n - 1).toLong))

  /** The z-key column for `df` over two numeric dimensions, quantile-
    * normalized to `bits` bits each via approxQuantile cut points
    * (driver-sized: 2^bits doubles per dimension). BOTH dimensions'
    * quantile sketches build in ONE corpus pass (the multi-column
    * approxQuantile overload) — at 100 TB the cut-point build is a single
    * scan however many dimensions the key interleaves. */
  def zKey(df: DataFrame, dimA: String, dimB: String, bits: Int = 8,
           relativeError: Double = 0.001): Column = {
    val n = 1 << bits
    val probs = (1 to n).map(_.toDouble / n).toArray
    val Array(cutsA, cutsB) =
      df.stat.approxQuantile(Array(dimA, dimB), probs, relativeError)
    zorder_key(bucketize(col(dimA).cast("double"), cutsA, n),
      bucketize(col(dimB).cast("double"), cutsB, n), lit(bits))
  }

  /** The variadic z-key: Morton interleave over 2-4 quantile-normalized
    * dimensions ([[graft.functions.ZOrderKeyN]] — the multi-column form
    * Delta's `OPTIMIZE ZORDER BY (a, b, c)` computes). Same
    * driver-collected cut-point normalization as [[zKey]] — ONE corpus
    * pass builds every dimension's sketch; `dims.length * bits` must stay <= 63,
    * and each added dimension halves the per-dimension resolution a fixed
    * file budget can hold — the standard 2-4 column guidance. */
  def zKeyN(df: DataFrame, dims: Seq[String], bits: Int = 8,
            relativeError: Double = 0.001): Column = {
    require(dims.length >= 2 && dims.length * bits <= 63,
      s"z-order needs >= 2 dims and dims*bits <= 63, got ${dims.length} x $bits")
    val n = 1 << bits
    val probs = (1 to n).map(_.toDouble / n).toArray
    // all dimensions' sketches in ONE corpus pass (see [[zKey]])
    val cuts = df.stat.approxQuantile(dims.toArray, probs, relativeError)
    val bucketized = dims.zip(cuts).map { case (d, c) =>
      bucketize(col(d).cast("double"), c, n)
    }
    zorder_key_n(array(bucketized: _*), lit(bits))
  }

  /** Write `df` z-ordered on `dims`: one range exchange on the z-key into
    * `numFiles` partitions + a within-partition sort, so every output file
    * covers a compact z-range (= a small box in dim space) and its parquet
    * min-max stats prune multi-dimensional predicates. */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
                    numFiles: Int, bits: Int): Unit = {
    val keyed = df.withColumn("__z",
      if (dims.length == 2) zKey(df, dims.head, dims(1), bits)
      else zKeyN(df, dims, bits))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** 2-d convenience overload (the original surface). */
  def writeZOrdered(df: DataFrame, path: String, dimA: String, dimB: String,
                    numFiles: Int, bits: Int = 8): Unit =
    writeZOrdered(df, path, Seq(dimA, dimB), numFiles, bits)

  /** File-level pruning evidence: per input file, the min/max of `dimA` and
    * `dimB`, and whether the file would be admitted by the box predicate
    * [aLo, aHi] x [bLo, bHi] on stats alone — the same test a parquet
    * reader's row-group filter runs. Used by ZOrderSpec to compare layouts. */
  def admittedFiles(df: DataFrame, dimA: String, dimB: String,
                    aLo: Double, aHi: Double, bLo: Double, bHi: Double): (Long, Long) =
    admittedFilesN(df, Seq((dimA, aLo, aHi), (dimB, bLo, bHi)))

  /** N-dimensional box variant of [[admittedFiles]]: each `(dim, lo, hi)`
    * must overlap the file's min-max for the file to be admitted. */
  def admittedFilesN(df: DataFrame, box: Seq[(String, Double, Double)]): (Long, Long) = {
    val aggs = box.zipWithIndex.flatMap { case ((d, _, _), i) =>
      Seq(min(col(d).cast("double")).as(s"mn_$i"), max(col(d).cast("double")).as(s"mx_$i"))
    }
    val stats = df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
    val pred = box.zipWithIndex.map { case ((_, lo, hi), i) =>
      col(s"mn_$i") <= hi && col(s"mx_$i") >= lo
    }.reduce(_ && _)
    (stats.filter(pred).count(), stats.count())
  }
}
