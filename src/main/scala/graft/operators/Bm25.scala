package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * BM25 ranked retrieval over a document corpus — the missing complement to
 * [[TextAnalysis]]'s TF-IDF keyterm EXTRACTION (terms that characterize a
 * doc): given a bag-of-words query, return the top-k documents by the
 * Okapi BM25 scoring function, the baseline every retrieval / RAG corpus
 * pipeline starts from.
 *
 * Determinism contract (the tx_keyterms technique): the IDF factor is the
 * RATIONAL (N - df + 0.5) / (df + 0.5) rather than its logarithm — ln is
 * monotone, so document RANKING is identical to textbook BM25, while every
 * arithmetic step (int casts, one add, one divide, ...) is an IEEE-754
 * correctly-rounded operation and therefore bit-identical across engines.
 * Derived constants (k1 + 1, 1 - b) are likewise mirrored as the SAME
 * correctly-rounded expressions on the oracle side, never as decimal
 * literals (DuckDB parses bare `2.2` as DECIMAL, and the nearest double to
 * 2.2 need not equal double(1.2) + 1.0). Per-document term scores are
 * summed in the FIXED query-term order via a pivot — a floating sum's
 * value depends on association order, so a shuffle-order `sum()` would not
 * hash-reproduce.
 *
 * Scale shape: tokens are filtered to the query vocabulary BEFORE the
 * (doc, term) tf aggregation, so the only corpus-sized shuffles are that
 * narrow candidate agg and the per-doc length agg — the inverted-index
 * property (only documents containing a query term are ever scored, and
 * payload text never leaves the scan projection). Per-term df and the
 * corpus stats row are broadcast. The global top-k is a
 * TakeOrderedAndProject (per-partition heaps, driver merges k rows), never
 * a global sort.
 */
object Bm25 {

  /** Top-`topK` documents for a bag-of-words `queryTerms`, scored with
    * Okapi BM25 (rational idf). Output: (idCol, rn, score), rn 1..topK by
    * (score desc, id asc). Duplicate query terms are an error — they would
    * double-count silently. */
  def search(df: DataFrame, textCol: String, idCol: String,
             queryTerms: Seq[String], topK: Int = 10,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, s"duplicate query terms: $queryTerms")
    val k1p1 = k1 + 1.0 // correctly-rounded double, mirrored in oracle SQL
    val oneMinusB = 1.0 - b
    val base = df.select(col(idCol).as("id"),
      size(filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0))
        .cast("long").as("dl"))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_toks"))
      .withColumn("avgdl",
        col("n_toks").cast("double") / col("n_docs").cast("double"))
    val qtf = df.select(col(idCol).as("id"),
        explode(filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0))
          .as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val qdf = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = qtf.join(broadcast(qdf), "term")
      .join(base, "id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("s",
        col("idf") * ((col("tf").cast("double") * lit(k1p1)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(oneMinusB) + lit(b) *
              (col("dl").cast("double") / col("avgdl"))))))
    val perDoc = scored.groupBy("id").pivot("term", queryTerms).agg(first(col("s")))
      .withColumn("score", queryTerms
        .map(t => coalesce(col(s"`$t`"), lit(0.0)))
        .reduceLeft(_ + _))
    perDoc.orderBy(col("score").desc, col("id").asc).limit(topK)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("score").desc, col("id").asc))
          .cast("long"))
      .select(col("id").as(idCol), col("rn"), col("score"))
  }
}
