package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/**
 * Model-based quality filter — the CCNet/fastText-style LEARNED
 * counterpart of [[TextAnalysis.qualityScore]]'s heuristic: train a
 * logistic model that predicts a target label (here: "is the document
 * target-language", the DSIR convention) from the row-local quality
 * features, then score the whole corpus with the FROZEN weights.
 *
 * The split of concerns is deliberate and production-shaped:
 *
 *  - TRAINING ([[train]]) runs once per model revision on a labeled
 *    sample: VectorAssembler -> MLlib LogisticRegression (L-BFGS).
 *    Reproducibility is pinned the way M3 pins the match forest: fixed
 *    70/30 split seed (32), fixed feature order, accuracy-band +
 *    weight-sign assertions in QualityModelSpec — not bitwise weight
 *    equality, which no distributed optimizer owes you.
 *  - SCORING ([[score]]) is a pure scan projection over BROADCAST-frozen
 *    weights: the logit is one fixed-shape arithmetic expression
 *    (`b + w0·x0 + w1·x1 + w2·x2 + w3·x3`, left-associated), no UDF, no
 *    model object on the hot path — whole-stage codegen keeps it at scan
 *    speed on 100 TB, and IEEE determinism makes every score replayable
 *    bit-for-bit in DuckDB from the pinned literal weights.
 *
 * The filter verdict thresholds the LOGIT, not the sigmoid: sigmoid is
 * monotone, so `p >= tau` is exactly `logit >= ln(tau/(1-tau))`, and the
 * logit avoids `exp` — the one operation with no cross-engine
 * correct-rounding guarantee.
 *
 * Features (fixed order, all row-local, all already oracled by
 * tx_quality): n_tokens/128 (the power-of-two scale keeps the division
 * exact), avg_token_len, punct_ratio, stopword_ratio.
 */
object QualityModel {

  /** Frozen model: intercept + one weight per feature, in feature order. */
  case class QualityLr(intercept: Double, wTokens: Double, wAvgLen: Double,
                       wPunct: Double, wStop: Double)

  val FeatureCols: Array[String] =
    Array("x_tokens", "x_avg_len", "x_punct", "x_stop")

  /** The row-local feature projection both training and scoring share —
    * one definition, no train/serve skew. */
  def featureFrame(df: DataFrame, textCol: String, idCol: String): DataFrame =
    TextAnalysis.withQualityFeatures(df, textCol)
      .select(col(idCol),
        (col("n_tokens").cast("double") / lit(128.0)).as("x_tokens"),
        col("avg_token_len").as("x_avg_len"),
        col("punct_ratio").as("x_punct"),
        col("stopword_ratio_q").as("x_stop"))

  /** Train on `label` (boolean column over `df`) with the M2/M3 protocol:
    * 70/30 split seed 32, L-BFGS logistic regression. Returns the frozen
    * weights and the held-out accuracy at the 0.5 threshold. */
  def train(df: DataFrame, textCol: String, idCol: String, label: Column,
            maxIter: Int = 100, regParam: Double = 0.0): (QualityLr, Double) = {
    val labeled = featureFrame(df, textCol, idCol)
      .join(df.select(col(idCol), label.cast("double").as("__label")), idCol)
    val assembled = new VectorAssembler()
      .setInputCols(FeatureCols).setOutputCol("features")
      .transform(labeled)
    val Array(trainDf, testDf) = assembled.randomSplit(Array(0.7, 0.3), seed = 32L)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol("__label").setFeaturesCol("features")
    val model = lr.fit(trainDf)
    val w = model.coefficients.toArray
    val frozen = QualityLr(model.intercept, w(0), w(1), w(2), w(3))
    val acc = model.transform(testDf)
      .select(avg(when(col("prediction") === col("__label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    (frozen, acc)
  }

  /** Score with FROZEN weights: one codegen'd projection, logit
    * left-associated exactly as documented (the order the oracle
    * replays). `keepLogit` is the verdict threshold in logit space
    * (0.0 = p >= 0.5).
    *
    * Zero-token documents are REJECTED outright (`keep = false`), not left
    * to the trained weights: with all feature weights <= 0 an empty doc
    * scores logit = intercept and would sail through — the exact
    * degenerate-input failure mode [[graft.operators.Curation]]'s
    * zero-token verdict rule closes for the DSIR gate, mirrored here so
    * the learned filter cannot admit content-free rows. The logit itself
    * is still emitted (visible, auditable); only the verdict gates. */
  def score(df: DataFrame, textCol: String, idCol: String, w: QualityLr,
            keepLogit: Double = 0.0): DataFrame =
    featureFrame(df, textCol, idCol)
      .withColumn("logit",
        lit(w.intercept) + lit(w.wTokens) * col("x_tokens") +
          lit(w.wAvgLen) * col("x_avg_len") + lit(w.wPunct) * col("x_punct") +
          lit(w.wStop) * col("x_stop"))
      .withColumn("keep",
        col("logit") >= lit(keepLogit) && col("x_tokens") > lit(0.0))
}
