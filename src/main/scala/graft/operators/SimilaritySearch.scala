package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), SURVEY.md §7.5.
 *
 * Scale shape: the query set is the SMALL side (broadcast); the corpus is the
 * 100 TB side and is never shuffled for the brute-force scan — cosine runs
 * inside the scan's codegen stage and top-k uses the rank-limit window
 * (bounded per-group state before the exchange). The LSH/IVF variant prunes
 * the corpus scan to matching buckets via an equi-join on the bucket key.
 */
object SimilaritySearch {

  /** Adds an integer `bucket` column: sign bits of `planes` random
    * hyperplane projections (fused single-pass kernel — see
    * [[graft.functions.HyperplaneBucket]]; weights from
    * [[graft.functions.VectorMath.planeWeight]], stable across rounds).
    * `dim` is retained for signature stability; the kernel uses the runtime
    * vector length. */
  def withHyperplaneBucket(df: DataFrame, vecCol: String, planes: Int,
                           dim: Int, seed: Long): DataFrame =
    df.withColumn("bucket", hyperplane_bucket(col(vecCol), lit(planes), lit(seed)))

  /**
   * Brute-force exact top-k cosine neighbors for every query vector.
   * `queries` (small, broadcast) x `corpus` -> BroadcastNestedLoopJoin,
   * cosine in codegen, rank-limit window for top-k per query.
   */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                    corpusId: String = "vec_id", corpusVec: String = "embedding",
                    queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", cosine_sim(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId).asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rn"))
  }

  /**
   * LSH-bucketed ANN: both sides are bucketed by hyperplane signs and joined
   * on the bucket equi-key, so only same-bucket candidates are scored. With
   * multi-probe disabled this trades recall for a corpus-scan prune factor of
   * ~2^planes. Returns top-k per query among candidates.
   */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             planes: Int = 4, dim: Int = 64, seed: Long = 42L,
             corpusId: String = "vec_id", corpusVec: String = "embedding",
             queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val c = withHyperplaneBucket(corpus, corpusVec, planes, dim, seed)
    val q = withHyperplaneBucket(queries, queryVec, planes, dim, seed)
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("cosine", cosine_sim(col(corpusVec), col(queryVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId).asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(queryId), col(corpusId), col("cosine"), col("rn"))
  }
}
