package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * Small-file compaction: rewrite a parquet directory into files of roughly
 * `targetBytes` each. Streaming ingest (one file per micro-batch — see
 * [[graft.streaming.CorpusIngest]]) and fine-grained partitioned writes
 * accumulate thousands of KB-sized files; at 100 TB that degrades every
 * downstream scan (per-file open cost, tiny row groups defeat parquet
 * statistics, driver-side listing balloons). A periodic compaction pass is
 * the standard maintenance job.
 *
 * The partition count comes from the ACTUAL input byte size (Hadoop
 * listing), not a row-count guess, so output files land near the target
 * regardless of row width. Round-robin repartition spreads rows evenly —
 * compaction must not skew file sizes the way a hash repartition on a
 * skewed column would. Writes to a NEW directory: swapping directories is
 * the caller's atomic-publish step (overwrite-in-place would lose data on
 * a mid-job failure).
 */
object Compaction {

  /** Total byte size of the data files under `dir` (recursive). */
  def inputBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Compact `inDir` parquet into ~`targetBytes` files at `outDir`.
    * Returns the file count written. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = inputBytes(spark, inDir)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Batch ids currently admitted under a `batch_id=`-partitioned growing
    * artifact (ascending) — the compaction planner's input, shared by the
    * vector index and the dedup band index. */
  def admittedBatchIds(spark: SparkSession, dir: String): Seq[Long] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .flatMap(n => scala.util.Try(n.stripPrefix("batch_id=").toLong).toOption)
      .sorted
  }

  /** Data-file count under `dir` (recursive, non-hidden) — the
    * small-files metric compaction exists to shrink. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0
    else {
      val it = fs.listFiles(path, true)
      var n = 0
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) n += 1
      }
      n
    }
  }

  /**
   * Merge the `batch_id=fromBatch..toBatch` partitions of a growing
   * batch-partitioned artifact into the single partition
   * `batch_id=toBatch` — the shared core behind
   * [[graft.streaming.VectorIngest.compactBatches]] (which documents the
   * lifecycle contract) and
   * [[graft.streaming.CorpusIngest.compactAdmitted]]. Rows are immutable
   * by the growing-artifact contract, so the merge is a pure file
   * rewrite; a `cell` column (the IVF tier) is re-laid-out hive-style so
   * partition pruning survives.
   *
   * `dropIds = Some((tombstonesDir, idCol))` physically purges retracted
   * ids during the rewrite (deduplicated, broadcast — deletion-sized).
   *
   * Crash safety: rewrite lands in a hidden `.compact_tmp` dir
   * (invisible to partition discovery), covered partitions are dropped
   * only after it completes, rename is last — a crash mid-rewrite leaves
   * the originals serving.
   */
  def compactBatchPartitions(spark: SparkSession, dir: String,
                             fromBatch: Long, toBatch: Long,
                             targetBytes: Long = 128L << 20,
                             dropIds: Option[(String, String)] = None): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col}
    require(fromBatch <= toBatch,
      s"need fromBatch <= toBatch, got [$fromBatch, $toBatch]")
    val covered = admittedBatchIds(spark, dir)
      .filter(b => b >= fromBatch && b <= toBatch)
    require(covered.nonEmpty,
      s"no batch_id partitions in [$fromBatch, $toBatch] under $dir")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = covered.map(b => inputBytes(spark, s"$dir/batch_id=$b")).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val rows0 = spark.read.parquet(dir)
      .filter(col("batch_id").between(fromBatch, toBatch))
      .drop("batch_id")
    val rows = dropIds match {
      case Some((tombDir, idCol)) =>
        val p = new org.apache.hadoop.fs.Path(tombDir)
        if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
          rows0
        else rows0.join(
          broadcast(spark.read.parquet(tombDir).select(col(idCol)).distinct()),
          Seq(idCol), "left_anti")
      case None => rows0
    }
    val tmp = new org.apache.hadoop.fs.Path(dir, s".compact_tmp_$toBatch")
    if (rows.columns.contains("cell"))
      // hash-partition by cell: every cell's rows land in one task, so the
      // hive layout writes one file per cell (the probe-pruning unit)
      rows.repartition(nFiles, col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(tmp.toString)
    else
      rows.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
    covered.foreach(b =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, s"batch_id=$b"), true))
    fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, s"batch_id=$toBatch"))
  }
}
