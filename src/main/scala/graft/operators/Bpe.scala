package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding vocabulary learning (Sennrich et al. 2016, the
 * public algorithm every LLM tokenizer pipeline starts from) — the one
 * standard training-data stage the text surface lacked: the engine could
 * COUNT subwords heuristically (`TextAnalysis.subwordCount`) but not
 * LEARN a merge table from a corpus.
 *
 * Scale shape: the only corpus-scale pass is the word-frequency count
 * (one explode + one map-side-combined aggregate). The merge loop then
 * runs on the aggregated dictionary — capped at `topWords` rows by
 * (count DESC, word ASC), the standard trainer move that bounds iteration
 * cost independently of corpus size — with each iteration one distributed
 * pair-count aggregate (argmax collects ONE row) and one narrow rewrite,
 * localCheckpointed so the per-iteration DAG stays flat (the
 * connected-components pattern, Dedup.clusters).
 *
 * DETERMINISM (what lets a SQL oracle replay training bit-for-bit):
 *  - pre-tokenization is the repo-wide convention — whitespace split of
 *    lower(trim(text)), empty tokens dropped;
 *  - pair counts are exact longs; the winning pair is
 *    (count DESC, left ASC, right ASC) — a total order;
 *  - symbol sequences are carried as MARKER-WRAPPED strings
 *    (<S> sym <E> per symbol, safe: the corpus is tokenized to
 *    whitespace-free words and the markers are control characters), so a
 *    merge is ONE plain `replace` of `<S> l <E> <S> r <E>`
 *    with `<S> lr <E>` — left-to-right non-overlapping in every
 *    engine, which is exactly the reference algorithm's scan order
 *    (pair (a,a) on "aaa" merges once: ["aa","a"]).
 */
object Bpe {

  private val S = "\u0001" // symbol start marker
  private val E = "\u0002" // symbol end marker
  private val W = "\u0003" // word separator (apply path)

  /** whitespace words of lower(trim(text)), empties dropped. */
  private def wordsOf(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0)

  /** Each character marker-wrapped: "ab" -> <S>a<E><S>b<E>. */
  private def wrap(word: Column): Column =
    regexp_replace(word, "(.)", s"$S$$1$E")

  /** Adjacent symbol pairs of a wrapped word, as (l, r) structs. */
  private def pairsOf(wrapped: Column): Column = {
    val syms = split(wrapped.substr(lit(2), length(wrapped) - 2), s"$E$S")
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
  }

  /** The corpus-scale pass: (wrapped word, count) dictionary, capped at
    * `topWords` by (count DESC, word ASC). */
  def wordCounts(docs: DataFrame, textCol: String = "text",
                 topWords: Int = 1000): DataFrame =
    docs.select(explode(wordsOf(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(topWords)
      .select(wrap(col("word")).as("w"), col("cnt"))

  /** Learn `numMerges` merges. Returns the driver-side merge list in rank
    * order — dictionary-sized by construction (<= numMerges rows; the same
    * documented trade as the IVF centroid collect). Stops early when no
    * pair remains. */
  def trainMerges(docs: DataFrame, textCol: String = "text",
                  numMerges: Int = 8, topWords: Int = 1000): Seq[(Int, String, String)] = {
    var wc = wordCounts(docs, textCol, topWords).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val best = wc.select(explode(pairsOf(col("w"))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += ((rank, l, r))
        wc = wc.select(
          replace(col("w"), lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E")).as("w"),
          col("cnt")).localCheckpoint()
        rank += 1
      }
    }
    merges.result()
  }

  /** Merge table as a frame: (merge_rank, pair_left, pair_right, merged). */
  def train(docs: DataFrame, textCol: String = "text",
            numMerges: Int = 8, topWords: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, numMerges, topWords)
      .map { case (rk, l, r) => (rk.toLong, l, r, l + r) }
      .toDF("merge_rank", "pair_left", "pair_right", "merged")
  }

  /** Tokenize with a learned merge list: per document, the BPE token count
    * after applying every merge in rank order. ONE codegen projection —
    * words wrap, join on a separator the merge patterns cannot cross, the
    * merge chain folds into consecutive `replace` calls on literals, and
    * the token count is the surviving start-marker count. */
  def applyTokenCount(docs: DataFrame, merges: Seq[(Int, String, String)],
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val s0 = array_join(transform(wordsOf(col(textCol)), w => wrap(w)), W)
    val sN = merges.sortBy(_._1).foldLeft(s0) { case (acc, (_, l, r)) =>
      replace(acc, lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E"))
    }
    docs.select(col(idCol),
      (length(sN) - length(replace(sN, lit(S), lit("")))).cast("long")
        .as("n_tokens_bpe"))
  }
}
