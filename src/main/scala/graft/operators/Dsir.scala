package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.word_shingles

/**
 * Data Selection via Importance Resampling (DSIR, Xie et al., NeurIPS
 * 2023): score every raw-corpus document by the log-likelihood ratio of
 * two hashed-n-gram bag-of-words models — one fit on a TARGET domain,
 * one on the raw corpus — and keep the top-weighted documents. This is
 * the standard pre-training data-selection recipe when you have a small
 * high-quality target (e.g. "formal English text") and a 100 TB raw
 * crawl: rank raw documents by how target-like their hashed n-gram
 * profile is.
 *
 * Features are the paper's hashed bag of word unigrams + bigrams: each
 * n-gram hashes (the engine-wide FNV word-shingle kernel,
 * [[graft.functions.TextAlgos.shingles]]) into one of `buckets` buckets
 * (power of two, so the bucket is the hash's low bits — identical for
 * the signed Spark value and the oracle's unsigned replay). Both
 * generative models are add-one-smoothed multinomials over the buckets;
 * the importance weight of document d with per-bucket occurrence counts
 * c_b is
 *
 *   log2 w(d) = sum_b c_b * [ log2 p_target(b) - log2 p_raw(b) ]
 *
 * DETERMINISM — the repo-wide "exact integers, one trailing float op"
 * contract: every log2 is computed by [[log2fp]], an EXACT fixed-point
 * integer algorithm (floor of 2^30 * log2 x via the classic
 * mantissa-squaring bit recurrence — no libm, no platform log). The
 * per-bucket LLR table and every per-document sum are plain 64-bit
 * integer arithmetic, order-independent and bit-identical in the DuckDB
 * oracle (which replays log2fp with a 30-step recursive CTE); the only
 * float op is the final display division by 2^30 (exact — it only
 * shifts the exponent).
 *
 * Selection is deterministic top-k (weight desc, id asc) — the
 * measure-zero plug-in point for the paper's Gumbel-top-k resampling,
 * which would add a hash-derived perturbation to the score before the
 * same top-k. We keep the ranking deterministic so the whole operator
 * is oracle-able end to end.
 *
 * Scale shape (the 100 TB plan) — train once, score row-locally:
 *  - TRAIN ([[trainModel]]): one corpus pass; the bucket censuses are
 *    map-side-combined counts on a FIXED domain of `buckets` keys (the
 *    only shuffle, carrying at most partitions x buckets rows), folded
 *    into a dense `buckets`-long LLR table on the driver (the same
 *    cap-bounded collect class as the k-means centroids and the BPE
 *    dictionary);
 *  - SCORE ([[scoreWithModel]]): the table rides into every task as a
 *    codegen reference object, so per-document scoring is one pass over
 *    the feature-bucket array INSIDE the scan projection — no explode,
 *    no join, no shuffle; the text payload never leaves the scan;
 *  - SELECT: the top-k threshold is TakeOrdered(k) + a one-row
 *    broadcast comparison — no global sort, no single-partition window.
 */
object Dsir {

  /** Fractional bits of the fixed-point log2 lattice (see
    * [[graft.functions.FpMath]], the shared kernel). */
  val FracBits: Int = graft.functions.FpMath.FracBits
  val One: Long = graft.functions.FpMath.One

  /** Exact 2^30-lattice log2 (x >= 1) — [[graft.functions.FpMath.log2fp]]. */
  def log2fp(x: Long): Long = graft.functions.FpMath.log2fp(x)

  /** Hashed unigram+bigram feature buckets of a text column as
    * array<int>; bigrams only exist for documents with >= 2 tokens (the
    * shingle kernel's 1-token fallback would otherwise duplicate the
    * unigram). `buckets` must be a power of two: pmod on the signed
    * 64-bit hash is then exactly the hash's low bits, which the oracle
    * reproduces as unsigned-mod. */
  def featureBuckets(text: Column, buckets: Int): Column = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val toks = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val grams = concat(
      word_shingles(text, lit(1)),
      when(size(toks) >= 2, word_shingles(text, lit(2)))
        .otherwise(array().cast("array<long>")))
    transform(grams, h => pmod(h, lit(buckets.toLong)).cast("int"))
  }

  /**
   * Per-document DSIR importance weights and top-k selection.
   *
   * @param df       raw corpus
   * @param isTarget row predicate defining the target domain (a SUBSET
   *                 of `df` here; a separate target DataFrame plugs into
   *                 the same censuses)
   * @param buckets  hashed-feature bucket count (power of two)
   * @param topK     documents to select
   * @return one row per input document: id, n_feats (feature
   *         occurrences), llr_fp (exact log2 weight in 2^-30 units),
   *         log2_weight (float view), selected
   */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
                        isTarget: Column, buckets: Int = 4096,
                        topK: Int = 100, checkpoint: Boolean = true): DataFrame = {
    val scored = scoredWeights(df, textCol, idCol, isTarget, buckets, checkpoint)
    withTopKFlag(scored, col("llr_fp"), topK, "selected")
      .select(col("__id").as(idCol), col("n_feats"), col("llr_fp"),
        (col("llr_fp").cast("double") / One).as("log2_weight"),
        col("selected"))
  }

  /**
   * The paper's actual resampling step: Gumbel-top-k sampling WITHOUT
   * replacement, P(doc enters the sample) ∝ its importance weight —
   * computed ENTIRELY on the exact lattice. The Gumbel-max trick is
   * base-invariant (a log-base change scales and shifts every key by
   * the same constants, so the top-k set is unchanged); in base 2 the
   * perturbed key is
   *
   *   key = log2 w(d) + ( -log2( -log2 u_d ) ),  u_d ~ U(0, 1)
   *
   * and both logs land on the lattice by applying [[log2fp]] twice:
   * u_d is a 63-bit hash fraction h/2^63 (mix64 of the id xor seed —
   * replayed by the oracle's mirrored hash kernels), so
   * -log2 u_d = 63·2^30 - log2fp(h) is itself a positive lattice
   * integer, and -log2 of THAT lattice value is 30·2^30 - log2fp(·).
   * No float enters the ranking; the same (key desc, id asc) TakeOrdered
   * + broadcast-threshold selection as [[importanceWeights]].
   */
  def gumbelSample(df: DataFrame, textCol: String, idCol: String,
                   isTarget: Column, buckets: Int = 4096,
                   topK: Int = 100, seed: Long = 42L,
                   checkpoint: Boolean = true): DataFrame = {
    val scored = scoredWeights(df, textCol, idCol, isTarget, buckets, checkpoint)
    val keyed = scored.withColumn("gumbel_fp",
      col("llr_fp") + gumbelNoiseFp(col("__id"), seed))
    withTopKFlag(keyed, col("gumbel_fp"), topK, "sampled")
      .select(col("__id").as(idCol), col("llr_fp"), col("gumbel_fp"),
        col("sampled"))
  }

  /** Lattice Gumbel perturbation of an id column: -log2(-log2 u) in
    * 2^-30 units, u the 63-bit fraction of mix64(id ^ seed). Zero-hash
    * is floored to 1 (probability-2^-63 edge, handled identically in the
    * oracle replay). */
  def gumbelNoiseFp(id: Column, seed: Long): Column = {
    val h = greatest(
      shiftrightunsigned(graft.functions.mix64(id.cast("long").bitwiseXOR(lit(seed))), 1),
      lit(1L))
    val negLog2U = lit(63L << FracBits) - graft.functions.log2fp(h)
    lit(30L << FracBits) - graft.functions.log2fp(negLog2U)
  }

  /**
   * The trained importance model: the DENSE per-bucket lattice LLR table
   * (`buckets` longs — a few KB of driver state, the same bounded class
   * as the k-means centroids). Buckets never seen in the raw-corpus
   * census carry the add-one default (lZr − lZt, i.e. cr = ct = 0), so
   * scoring a NEW document that hashes into an unseen bucket — the
   * serving case — follows the same smoothed multinomials.
   */
  final case class LlrModel(buckets: Int, llr: Array[Long]) {
    require(llr.length == buckets, s"dense table: ${llr.length} != $buckets")
  }

  /**
   * One corpus pass -> the trained [[LlrModel]]: the bucket census is a
   * fixed-domain map-side-combined count (the shuffle carries at most
   * partitions x buckets rows), folded into the dense table on the
   * driver. TRAIN ONCE, score anywhere — the batch operators below and
   * [[graft.streaming.DsirServing]] both score against this table.
   */
  def trainModel(df: DataFrame, textCol: String, isTarget: Column,
                 buckets: Int): LlrModel = {
    val census = df
      .select(isTarget.as("__tgt"),
        explode(featureBuckets(col(textCol), buckets)).as("__b"))
      .groupBy("__b")
      .agg(count(lit(1)).as("cr"),
           sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

    val nRaw = census.map(_._2).sum
    val nTgt = census.map(_._3).sum
    val lZt = log2fp(nTgt + buckets) // log2 target normalizer
    val lZr = log2fp(nRaw + buckets)
    // add-one default for unseen buckets: log2fp(1) = 0 on both sides
    val dense = Array.fill(buckets)(lZr - lZt)
    census.foreach { case (b, cr, ct) =>
      dense(b) = (log2fp(ct + 1) - lZt) - (log2fp(cr + 1) - lZr)
    }
    LlrModel(buckets, dense)
  }

  /**
   * ROW-LOCAL scoring against a trained model: the dense LLR table rides
   * as a codegen reference object ([[graft.functions.DsirScore]]), so a
   * document's score is one pass over its feature-bucket array inside
   * the scan projection — no explode, no census join, NO SHUFFLE. At
   * 100 TB the scoring leg reads the corpus exactly once and writes
   * narrow (id, n_feats, llr_fp) rows; this is also the entire per-batch
   * work of streaming serving. Null/empty documents score (0, 0), the
   * absent-from-explode contract of the census-join formulation.
   */
  def scoreWithModel(df: DataFrame, textCol: String, idCol: String,
                     model: LlrModel): DataFrame =
    df.select(col(idCol).as("__id"),
        featureBuckets(col(textCol), model.buckets).as("__bs"))
      .select(col("__id"),
        coalesce(size(col("__bs")), lit(0)).cast("long").as("n_feats"),
        coalesce(graft.functions.dsir_score(col("__bs"), model.llr), lit(0L))
          .as("llr_fp"))

  /** Shared scoring leg of the batch queries: train ([[trainModel]], one
    * census pass) then score row-locally ([[scoreWithModel]]). */
  private def scoredWeights(df: DataFrame, textCol: String, idCol: String,
                            isTarget: Column, buckets: Int,
                            checkpoint: Boolean): DataFrame = {
    val model = trainModel(df, textCol, isTarget, buckets)
    // narrow (id, n_feats, llr_fp) rows, materialized once: three
    // consumers downstream (the output join and the two threshold
    // aggregates) would otherwise each re-run the scan + scoring;
    // checkpoint=false keeps the whole pipeline in one inspectable plan
    // (PlanShapeSpec pins the exchanges)
    val scoredRaw = scoreWithModel(df, textCol, idCol, model)
    if (checkpoint) scoredRaw.localCheckpoint() else scoredRaw
  }

  /**
   * Per-stratum KL divergence from the corpus mixture, on the exact
   * lattice — the domain-drift / distinctiveness monitor of a mixture
   * pipeline: for each stratum s (source, language, snapshot), how far
   * its hashed-n-gram distribution sits from the corpus-wide one,
   *
   *   KL(P_s ‖ Q) = Σ_b p_b (log2 p_b − log2 q_b)
   *
   * with the same add-one multinomials as [[importanceWeights]]
   * (p_b = (c_sb + 1)/(n_s + B), q_b = (c_b + 1)/(N + B), B = `buckets`).
   * A rising KL for a source between crawls is the standard drift alarm;
   * a near-zero KL marks a source indistinguishable from the mixture.
   *
   * EXACT: the lattice-integer output is the divergence scaled by the
   * per-stratum normalizer, kl_fp = (n_s + B) · KL in 2^-30 units —
   * every log2 is [[log2fp]] and every sum is 64-bit integer arithmetic,
   * so the DuckDB oracle replays it bit-for-bit; the float `kl_bits`
   * view divides out the normalizer at the very end. Σ runs over the
   * FULL fixed bucket domain (absent buckets contribute their add-one
   * terms — dropping them would bias KL low for small strata).
   *
   * Scale shape: two fixed-domain censuses (the (stratum, bucket) and
   * (bucket) counts — map-side-combined, ≤ strata × buckets rows in any
   * exchange), the bucket census broadcast, and the full domain built by
   * crossing the (small) strata frame with a `range(buckets)` — sized by
   * strata × buckets, INDEPENDENT of corpus size. Text never leaves the
   * scan.
   */
  def domainDivergence(df: DataFrame, textCol: String, stratum: Column,
                       buckets: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    val feats = df.select(stratum.as("stratum"),
      explode(featureBuckets(col(textCol), buckets)).as("__b"))
    val perSb = feats.groupBy("stratum", "__b").agg(count(lit(1)).as("csb"))
    val perB = feats.groupBy("__b").agg(count(lit(1)).as("cb"))
    val perS = perSb.groupBy("stratum").agg(sum("csb").as("ns"))
    val totals = perB.agg(sum("cb").as("n"))
    val lgB = lit(buckets.toLong)
    val domain = perS
      .crossJoin(broadcast(spark.range(buckets).select(col("id").cast("int").as("__b"))))
    val cells = domain
      .join(perSb, Seq("stratum", "__b"), "left")
      .join(broadcast(perB), Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("stratum"), col("ns"), col("n"),
        coalesce(col("csb"), lit(0L)).as("csb"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val term = (col("csb") + 1L) *
      ((graft.functions.log2fp(col("csb") + 1L) - graft.functions.log2fp(col("ns") + lgB))
        - (graft.functions.log2fp(col("cb") + 1L) - graft.functions.log2fp(col("n") + lgB)))
    cells.groupBy("stratum")
      .agg(first("ns").as("n_feats"), sum(term).as("kl_fp"))
      .withColumn("kl_bits",
        col("kl_fp").cast("double")
          / ((col("n_feats") + lgB).cast("double") * lit(One.toDouble)))
  }

  /** Deterministic top-k flag on `keyCol` (desc, id asc tiebreak) without
    * a global sort: TakeOrdered(k) -> the k-th row is (min key, then max
    * id) within the prefix; selection is a one-row broadcast comparison. */
  private def withTopKFlag(scored: DataFrame, keyCol: Column, topK: Int,
                           flagName: String): DataFrame = {
    val topk = scored.orderBy(keyCol.desc, col("__id").asc).limit(topK)
    val kth = topk.agg(min(keyCol).as("thr_key"))
    val thr = topk.join(broadcast(kth))
      .where(keyCol === col("thr_key"))
      .agg(max("__id").as("thr_id"), first("thr_key").as("thr_key"))
    scored.join(broadcast(thr))
      .withColumn(flagName,
        keyCol > col("thr_key") ||
          (keyCol === col("thr_key") && col("__id") <= col("thr_id")))
      .drop("thr_key", "thr_id")
  }
}
