package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic global shuffle for training order: pre-training wants
 * documents in an order uncorrelated with their origin (crawl order, domain
 * grouping, dedup clusters), reproducible across runs. The shuffle key is
 * content-derived — `md5(seed || text)` — so the permutation is a pure
 * function of (seed, corpus): re-running, re-sharding, or re-numbering the
 * corpus yields the identical training order, and a new seed yields an
 * independent one.
 *
 * Scale shape: `repartitionByRange(shuffle_key) + sortWithinPartitions`
 * is the scalable form of `ORDER BY rand(seed)` — a sampled range exchange
 * plus per-partition sorts gives a TOTAL order across output files (every
 * key in part i precedes every key in part i+1) without funneling the
 * corpus through one task the way a global `orderBy.coalesce(1)` would.
 */
object ShuffledExport {

  /** Append the content-keyed shuffle key (exposed for tests/composition). */
  def withShuffleKey(df: DataFrame, textCol: String, seed: Long): DataFrame =
    df.withColumn("shuffle_key", md5(concat(lit(seed.toString), lit(":"), col(textCol))))

  def writeShuffled(df: DataFrame, textCol: String, outDir: String,
                    seed: Long, numFiles: Int): Unit =
    withShuffleKey(df, textCol, seed)
      .repartitionByRange(numFiles, col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")
      .write.mode("overwrite").parquet(outDir)
}
