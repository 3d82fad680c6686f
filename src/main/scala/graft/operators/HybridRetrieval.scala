package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval fusion by Reciprocal Rank Fusion (Cormack, Clarke &
 * Büttcher, SIGIR 2009): combine the ranked lists of heterogeneous
 * retrievers — lexical BM25 ([[Bm25.search]]) and dense ANN
 * ([[SimilaritySearch]]) being the canonical pair — into one list by
 *
 *   rrf(d) = Σ_legs 1 / (k + rank_leg(d)),   absent-from-leg ⇒ 0
 *
 * RRF consumes RANKS only (never raw scores), which is why it fuses
 * incomparable score scales without calibration and why it is exactly
 * reproducible across engines: ranks are deterministic integers (each
 * leg breaks ties by id), and the fused score is a fixed-shape sum of
 * exact double divisions.
 *
 * Scale shape: each leg is already a top-k output — driver-small by its
 * own contract (the legs carry the engine's scale plans: BM25's narrow
 * census joins, ANN's broadcast-queries/never-shuffle-the-corpus). The
 * fusion itself joins k-row frames — broadcast-sized at any corpus
 * scale, and the final top-k is an order-limit over ≤ Σ k rows.
 */
object HybridRetrieval {

  /**
   * Fuse named legs, each a DataFrame with (`idCol`, `rn`) — rank 1 is
   * best. Output: one row per fused candidate with the per-leg ranks
   * (`rn_<name>`, NULL where the leg missed the document), the fused
   * `rrf` score, and the final `rn` by (rrf desc, id asc), cut to
   * `topK`.
   */
  def rrf(legs: Seq[(String, DataFrame)], idCol: String,
          kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(legs.size >= 2, "rrf needs at least two legs")
    require(legs.map(_._1).distinct.size == legs.size, "leg names must be unique")
    val renamed = legs.map { case (name, df) =>
      df.select(col(idCol), col("rn").cast("long").as(s"rn_$name"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    // fixed summation shape (legs order), so the double is engine-exact
    val fused = legs.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(kRrf).cast("double") + col(s"rn_$name").cast("double")),
        lit(0.0))
    }.reduceLeft(_ + _)
    val w = Window.orderBy(col("rrf").desc, col(idCol).asc)
    joined.withColumn("rrf", fused)
      .orderBy(col("rrf").desc, col(idCol).asc).limit(topK)
      .withColumn("rn", row_number().over(w).cast("long"))
  }
}
