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
}
