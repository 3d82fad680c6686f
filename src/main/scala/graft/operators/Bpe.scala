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
 * cost independently of corpus size. Because the capped dictionary is
 * DRIVER-SIZED BY CONSTRUCTION (<= topWords rows of whitespace-free
 * words), it is collected ONCE and the merge loop folds locally: a
 * production 32k-merge vocabulary is 32k in-memory argmax passes over
 * <= topWords short strings, not 32k Spark jobs (the round-10 shape ran
 * one distributed pair-count aggregate per merge — fine at 8 merges,
 * pathological at 32k). Same documented collect trade as the IVF
 * centroid table; merge-list equality with a from-scratch in-test BPE
 * trainer is pinned by BpeSpec.
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

  /** Code-point lexicographic comparison — the order UTF8String (Spark)
    * and DuckDB's binary collation sort strings in. java.lang.String
    * compareTo compares UTF-16 CODE UNITS, which inverts supplementary-
    * plane characters (U+10000+, high surrogate 0xD800-0xDBFF) against
    * U+E000-U+FFFF — so a count-tie argmax using tuple Ordering could pick
    * a different merge than the distributed orderBy / the SQL oracle.
    * Code-point order == UTF-8 byte order, so this matches both. */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** whitespace words of lower(trim(text)), empties dropped. */
  private def wordsOf(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0)

  /** Each character marker-wrapped: "ab" -> <S>a<E><S>b<E>. */
  private def wrap(word: Column): Column =
    regexp_replace(word, "(.)", s"$S$$1$E")

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
    * order. ONE Spark job: the capped dictionary (<= topWords rows) is
    * collected and the merge loop folds locally over marker-wrapped
    * strings, bit-identical to the round-10 distributed loop —
    *  - pair counts sum each ADJACENT OCCURRENCE (pair (a,a) on "aaa"
    *    counts twice, exactly what explode(pairsOf) counted);
    *  - argmax order is (count DESC, left ASC, right ASC), a total order;
    *  - the rewrite is java.lang.String.replace — left-to-right
    *    non-overlapping, the same semantics as the SQL `replace` the
    *    distributed loop used (and the oracle SQL still replays).
    * Stops early when no pair remains. */
  def trainMerges(docs: DataFrame, textCol: String = "text",
                  numMerges: Int = 8, topWords: Int = 1000): Seq[(Int, String, String)] = {
    var dict: Array[(String, Long)] =
      wordCounts(docs, textCol, topWords).collect()
        .map(r => (r.getString(0), r.getLong(1)))
    val merges = Seq.newBuilder[(Int, String, String)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (w, cnt) =>
        // symbols of <S>a<E><S>b<E>... : strip the outer markers, split on E+S
        val syms = w.substring(1, w.length - 1).split(s"$E$S", -1)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // argmax by (count DESC, left ASC, right ASC) in CODE-POINT order —
        // a total order (pair keys are unique), so the HashMap's iteration
        // order cannot leak into the result
        val ((l, r), _) = counts.reduceLeft { (x, y) =>
          val ((lx, rx), cx) = x
          val ((ly, ry), cy) = y
          val yBetter = cy > cx || (cy == cx && {
            val cl = cpCompare(ly, lx)
            cl < 0 || (cl == 0 && cpCompare(ry, rx) < 0)
          })
          if (yBetter) y else x
        }
        merges += ((rank, l, r))
        dict = dict.map { case (w, cnt) =>
          (w.replace(s"$S$l$E$S$r$E", s"$S$l$r$E"), cnt)
        }
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

  /** The folded marker string for a document: words wrapped, joined on a
    * separator no merge pattern can cross, every merge applied in rank
    * order as one literal `replace` — the shared core of
    * [[applyTokenCount]] and [[applyTokens]], a single codegen projection. */
  private def foldedSymbols(textCol: String,
                            merges: Seq[(Int, String, String)]): Column = {
    val s0 = array_join(transform(wordsOf(col(textCol)), w => wrap(w)), W)
    merges.sortBy(_._1).foldLeft(s0) { case (acc, (_, l, r)) =>
      replace(acc, lit(s"$S$l$E$S$r$E"), lit(s"$S$l$r$E"))
    }
  }

  /** Full tokenization: per document, the BPE token STRINGS in order as an
    * array<string> column plus the token count — what sequence building
    * actually consumes, where [[applyTokenCount]] only audits budget. An
    * array (not a joined scalar) because document text can contain any
    * separator a consumer might split on — '|' included — which would make
    * token boundaries ambiguous downstream; the driver's oracle projection
    * joins the array only for engine comparison. Same one-projection
    * shape: the surviving marker-wrapped symbols ARE the tokens, extracted
    * with one regexp pass over the folded string. Null text tokenizes to
    * the empty sequence (0 tokens), not NULL — an absent document
    * contributes nothing to a sequence, the same convention as the
    * oracle's COALESCE. */
  def applyTokens(docs: DataFrame, merges: Seq[(Int, String, String)],
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sN = coalesce(foldedSymbols(textCol, merges), lit(""))
    val toks = regexp_extract_all(sN, lit(s"$S([^$S$E]+)$E"), lit(1))
    docs.select(col(idCol),
      toks.as("tokens"),
      size(toks).cast("long").as("n_tokens_bpe"))
  }

  /** Tokenize with a learned merge list: per document, the BPE token count
    * after applying every merge in rank order. ONE codegen projection —
    * words wrap, join on a separator the merge patterns cannot cross, the
    * merge chain folds into consecutive `replace` calls on literals, and
    * the token count is the surviving start-marker count. */
  def applyTokenCount(docs: DataFrame, merges: Seq[(Int, String, String)],
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sN = foldedSymbols(textCol, merges)
    docs.select(col(idCol),
      (length(sN) - length(replace(sN, lit(S), lit("")))).cast("long")
        .as("n_tokens_bpe"))
  }
}
