package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * Deduplication operators for the large-scale training-data surface
 * (SURVEY.md §7.5). Every variant is expressed so the expensive comparison is
 * an EQUI-join on a derived key (hash / LSH band / simhash block), never an
 * all-pairs cross join — the property that keeps these O(n·k) with hash
 * shuffles at 100 TB instead of O(n²):
 *
 *  - exact: groupBy(hash(text)) — one shuffle on a 64/128-bit key;
 *  - MinHash+LSH: shingle -> k-hash signature -> band keys -> explode ->
 *    self-equi-join on (band, key) -> verify with exact Jaccard;
 *  - SimHash: 64-bit fingerprint, candidates = equal 16-bit blocks
 *    (Hamming<=3 guarantee via pigeonhole over 4 blocks);
 *  - n-gram Jaccard: exact verifier used on LSH candidates only.
 */
object Dedup {

  /** Exact dedup: first row (min orderCol) per identical `textCol` wins.
    * Hash-groupBy, single shuffle; map-side partial aggregation applies. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup keeping full surviving rows (the "apply" form). */
  def exactKeepRows(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /**
   * MinHash-LSH near-duplicate candidate pairs with exact-Jaccard
   * verification. Signature: `numHashes` minhashes over word `shingleW`-
   * shingles; `bands` bands of `numHashes/bands` rows each.
   *
   * The self-join is an equi-join on the band key -> sort-merge/hash join on
   * a shuffled key; candidate volume is bounded by bucket collisions, not n².
   * Verified pairs carry the exact word-shingle Jaccard for thresholding.
   */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 shingleW: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 jaccardThreshold: Double = 0.8): DataFrame = {
    val rows = numHashes / bands
    val withBands = df.select(
        col(idCol).as("id"), col(textCol).as("text"),
        minhash_sig(col(textCol), lit(shingleW), lit(numHashes)).as("sig"))
      .select(col("id"), col("text"),
        posexplode(bandKeys(col("sig"), bands, rows)).as(Seq("band", "band_key")))
    val a = withBands.select(col("band"), col("band_key"),
      col("id").as("id_a"), col("text").as("text_a"))
    val b = withBands.select(col("band"), col("band_key"),
      col("id").as("id_b"), col("text").as("text_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("text_a"), col("text_b"))
      .distinct() // a pair may collide in several bands
      .withColumn("jaccard", ngram_jaccard(col("text_a"), col("text_b"), lit(shingleW)))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  private def bandKeys(sig: org.apache.spark.sql.Column, bands: Int, rows: Int) =
    array((0 until bands).map { b =>
      hash((0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*).cast("long")
    }: _*)

  /**
   * SimHash near-dup candidates: 64-bit fingerprints are split into 4
   * 16-bit blocks; docs sharing any block are candidates (pigeonhole: any
   * pair within Hamming distance 3 shares at least one block). Candidates
   * are verified with the true Hamming distance — a codegen'd bit_count.
   */
  def simhashNearDup(df: DataFrame, textCol: String, idCol: String,
                     maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val blocks = withSim.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sim"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("block_idx", "block_val")))
    val a = blocks.select(col("block_idx"), col("block_val"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val b = blocks.select(col("block_idx"), col("block_val"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("block_idx", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sim_a"), col("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /**
   * Embedding-cosine near-duplicates above `threshold`, bucketed by random
   * hyperplane signs (LSH) so the pairwise check happens only inside
   * buckets. `planes` sign bits -> 2^planes buckets.
   */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double = 0.95, planes: Int = 8,
                       dim: Int = 64, seed: Long = 42L): DataFrame = {
    val bucketed = SimilaritySearch.withHyperplaneBucket(df, vecCol, planes, dim, seed)
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine_sim(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
