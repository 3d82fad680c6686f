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

  /** Deterministic pseudo-random unit-ish hyperplanes (mulberry-style LCG on
    * (seed, plane, dim) -> [-1,1)) — stable across executors and rounds. */
  private def planeWeight(seed: Long, plane: Int, d: Int): Double = {
    var z = seed + 0x9e3779b97f4a7c15L * (plane.toLong * 131071L + d + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Dot product of the embedding with hyperplane `p` as a Column. */
  private def planeDot(vecCol: Column, p: Int, dim: Int, seed: Long): Column =
    (0 until dim).map(d =>
      element_at(vecCol, d + 1).cast("double") * lit(planeWeight(seed, p, d)))
      .reduce(_ + _)

  /** Adds an integer `bucket` column: sign bits of `planes` random
    * hyperplane projections. */
  def withHyperplaneBucket(df: DataFrame, vecCol: String, planes: Int,
                           dim: Int, seed: Long): DataFrame = {
    val bucket = (0 until planes).map { p =>
      when(planeDot(col(vecCol), p, dim, seed) >= 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

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
