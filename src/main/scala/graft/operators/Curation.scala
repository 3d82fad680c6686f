package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{bloom_might_contain, dsir_score, lsh_bands, minhash_sig}

/**
 * End-to-end BATCH curation — the composition the individual operators
 * exist for, in ONE pipeline over exactly TWO corpus scans:
 *
 *   decontaminate → DSIR-select → soft-dedup-weight → curriculum-pack
 *
 * (the batch twin of [[graft.streaming.CurationPipeline]]'s fused
 * per-batch projection, extended with the dedup-weighting and packing
 * stages a one-pass stream cannot do).
 *
 * Scan budget (pinned in PlanShapeSpec):
 *   scan 1 — the DSIR census ([[Dsir.trainModel]]: fixed-domain
 *     map-side-combined bucket counts, folded into the dense LLR table on
 *     the driver);
 *   scan 2 — ONE projection computing, row-locally, everything every
 *     later stage needs: token count, the Bloom-positive suspect-gram
 *     list (eval sketch as a codegen reference object), the DSIR score
 *     against the trained table, and the minhash signature (+1 salvage
 *     hash). The result is localCheckpointed; text is NEVER touched
 *     again.
 *
 * Stage semantics:
 *   - DECONTAMINATION is exact end-to-end, the [[TextAnalysis
 *     .contaminationBloom]] recipe: the sketch prefilter has no false
 *     negatives, and the confirm equi-join of the (tiny) suspect-gram
 *     explosion against the eval gram set removes its false positives.
 *     Any confirmed shared gram quarantines the document.
 *   - DSIR SELECTION is thresholded on the exact lattice (`llr_fp >=
 *     thresholdFp`), the same verdict rule the streaming gate applies —
 *     unlike top-k it composes without a global rank and its oracle is a
 *     per-row comparison. Zero-token documents are rejected outright:
 *     they have no feature buckets, so their NULL score would coalesce
 *     to 0 — the maximum on an all-negative-LLR corpus — and sort to
 *     the front of every curriculum shard while carrying no evidence.
 *   - SOFT-DEDUP runs on the SELECTED set: LSH band candidates from the
 *     checkpointed signatures (frequency-capped, salvage-sub-keyed — the
 *     [[Dedup.candidatesFromKeyed]] core), verified by SIGNATURE
 *     AGREEMENT (matching minhash components / numHashes >= simThreshold)
 *     rather than exact shingle Jaccard: the estimator is unbiased
 *     (E[agreement] = Jaccard), needs nothing but the 32-long signatures
 *     already in the narrow frame, and is what keeps the no-third-scan
 *     budget — the scale trade a 100 TB pass makes. Weights are
 *     [[Dedup.softDedupWeights]]' exact 1/|cluster| lattice numerators.
 *   - CURRICULUM packing orders the selected docs per stratum by
 *     (llr_fp DESC, id) — most target-like mass first — into fixed-token
 *     shards via [[TextAnalysis.curriculumShardsCounted]] (the banded
 *     two-level form, fed from the checkpoint's token counts).
 *
 * Output: one row per corpus document —
 * (idCol, stratum, n_tokens, llr_fp, n_shared_grams, verdict,
 *  cluster, csize, weight_fp, shard_id, shard_offset)
 * with the dedup/packing columns NULL unless verdict = 'selected'.
 */
object Curation {

  def curateBatch(corpus: DataFrame, evalDocs: DataFrame,
                  textCol: String, idCol: String,
                  stratum: Column, isTarget: Column,
                  thresholdFp: Long,
                  buckets: Int = 4096, n: Int = 3,
                  numBits: Int = 1 << 20, numHashes: Int = 5,
                  shingleW: Int = 3, mhHashes: Int = 32, bands: Int = 8,
                  simThreshold: Double = 0.5, maxBucketSize: Int = 10000,
                  shardTokens: Long = 2000L, scoreBands: Int = 1024,
                  scaleBits: Int = 20,
                  model0: Option[Dsir.LlrModel] = None,
                  sketch0: Option[Array[Byte]] = None,
                  metricTag: String = "curate",
                  checkpoint: Boolean = true): DataFrame = {
    require(bands > 0 && mhHashes % bands == 0,
      s"bands ($bands) must divide mhHashes ($mhHashes)")
    val rows = mhHashes / bands
    // scan 1: the DSIR census (skipped when a pre-trained model rides in —
    // the serving case, same contract as the streaming pipeline)
    val model = model0.getOrElse(Dsir.trainModel(corpus, textCol, isTarget, buckets))
    val sketch = sketch0.getOrElse(
      TextAnalysis.evalGramSketch(evalDocs, textCol, idCol, n, numBits, numHashes))
    // scan 2: the one row-local projection every stage feeds from
    val bs = Dsir.featureBuckets(col(textCol), model.buckets)
    val scored0 = corpus.select(
      col(idCol).as("id"),
      stratum.as("stratum"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      filter(array_distinct(TextAnalysis.gramArray(col(textCol), n)),
        g => bloom_might_contain(xxhash64(g), sketch)).as("suspect_grams"),
      coalesce(dsir_score(bs, model.llr), lit(0L)).as("llr_fp"),
      minhash_sig(col(textCol), lit(shingleW), lit(mhHashes + 1)).as("sigx"))
    val scored = if (checkpoint) scored0.localCheckpoint() else scored0
    // exact confirm: suspect grams are DISTINCT per doc, so the count after
    // the eval semi-join is the exact shared-gram count of TextAnalysis
    // .contamination — over bloom-positive survivors only
    val evalGrams = evalDocs
      .select(explode(TextAnalysis.gramArray(col(textCol), n)).as("gram"))
      .distinct()
    val shared = scored.select(col("id"), explode(col("suspect_grams")).as("gram"))
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_shared_grams"))
    val verdicts0 = scored.join(shared, Seq("id"), "left")
      .select(col("id"), col("stratum"), col("n_tokens"), col("llr_fp"),
        col("sigx"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      // zero-token documents carry no target evidence: their dsir_score is
      // NULL (no feature buckets) and coalesces to 0, which on an
      // all-negative-LLR corpus would be the MAXIMUM — reject them before
      // the threshold so empties cannot buy their way into every shard
      // front (they cannot be quarantined either: no grams, no overlap)
      .withColumn("verdict",
        when(col("n_shared_grams") > 0L, "quarantined")
          .when(col("n_tokens") === 0L, "rejected")
          .when(col("llr_fp") >= thresholdFp, "selected")
          .otherwise("rejected"))
    // three consumers (edges, packing, output) — materialize once
    val verdicts = if (checkpoint) verdicts0.localCheckpoint() else verdicts0
    val selected = verdicts.filter(col("verdict") === "selected")

    // LSH edges among the selected set, from the checkpointed signatures
    val keyed = selected.select(col("id"),
      element_at(col("sigx"), mhHashes + 1).as("sub_key"),
      posexplode(lsh_bands(slice(col("sigx"), 1, mhHashes), lit(rows)))
        .as(Seq("band", "band_key")))
    val cand = Dedup.candidatesFromKeyed(keyed, Seq("band", "band_key"),
      maxBucketSize, metricTag, subKeyCol = Some("sub_key"))
    val sigs = selected.select(col("id"), slice(col("sigx"), 1, mhHashes).as("sig"))
    // agreement >= ceil(simThreshold * mhHashes) <=> agreement-fraction >=
    // simThreshold — all-integer, oracle-exact
    val agreeMin = math.ceil(simThreshold * mhHashes).toLong
    val edges = cand
      .join(sigs.withColumnsRenamed(Map("id" -> "id_a", "sig" -> "sig_a")), "id_a")
      .join(sigs.withColumnsRenamed(Map("id" -> "id_b", "sig" -> "sig_b")), "id_b")
      .withColumn("agree",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (a, b) => when(a === b, 1L).otherwise(0L)), lit(0L), (acc, x) => acc + x))
      .filter(col("agree") >= agreeMin)
      .select("id_a", "id_b")

    val weights = Dedup.softDedupWeights(
      selected.select(col("id"), col("n_tokens")), edges, "id",
      col("n_tokens"), scaleBits, checkpoint = checkpoint)
    val packed = TextAnalysis.curriculumShardsCounted(
      selected, "id", col("n_tokens"), col("llr_fp"), col("stratum"),
      shardTokens, scoreBands, checkpoint)

    verdicts
      .select(col("id").as(idCol), col("stratum"), col("n_tokens"),
        col("llr_fp"), col("n_shared_grams"), col("verdict"))
      .join(weights.select(col("id").as(idCol), col("cluster"), col("csize"),
        col("weight_fp")), Seq(idCol), "left")
      .join(packed.select(col("id").as(idCol), col("shard_id"),
        col("shard_offset")), Seq(idCol), "left")
  }

  /**
   * Materialize a [[curateBatch]] result into physical training shards:
   * the selected documents, in their curriculum order, cut token-exact at
   * shard boundaries and written one text file per (stratum, shard_id)
   * under `outDir` — the [[TextAnalysis.writeCurriculumShards]] contract
   * fed from the curation's OWN packing decision instead of a fresh one.
   *
   * This is the pipeline's third and final corpus contact, and it is the
   * write itself: the decision passes stayed at two scans, and the
   * materialization necessarily re-reads text for exactly the selected
   * rows (the join prunes by id before any token work).
   */
  def writeCuratedShards(corpus: DataFrame, curated: DataFrame,
                         textCol: String, idCol: String,
                         shardTokens: Long, outDir: String): Unit = {
    val assign = curated.filter(col("verdict") === "selected")
      .select(col(idCol), col("stratum"), col("n_tokens"),
        col("shard_id"), col("shard_offset"))
    TextAnalysis.writeShardTexts(
      TextAnalysis.assembleShardTexts(
        TextAnalysis.shardSlicesFromAssignment(assign, corpus, textCol,
          idCol, shardTokens)),
      outDir)
  }
}
