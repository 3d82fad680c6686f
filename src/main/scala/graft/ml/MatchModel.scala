package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * MLlib re-expression of the reference's training path
 * (/root/reference/MODEL_TRAINING/train_model.py):
 * 5 similarity features -> VectorAssembler -> RandomForest(100 trees,
 * seed 32) -> multiclass evaluation.
 *
 * Per SURVEY.md §7.4.6 the training path computes features on RAW strings
 * (train_model.py:16-23 does not normalize), unlike the serving path —
 * `buildFeatures(normalize = false)` preserves that. RNG streams differ from
 * sklearn, so parity is asserted as an accuracy band (>= 0.85 vs the
 * reference's ~0.90 claim), not row equality.
 */
object MatchModel {

  val FeatureCols: Array[String] =
    Array("levenshtein", "partial_ratio", "token_set_ratio", "soundex_match", "metaphone_match")

  /** The 5-feature engineering step (train_model.py:15-26) as one projection. */
  def buildFeatures(pairs: DataFrame, usernameCol: String = "username",
                    nameCol: String = "employee_name",
                    normalize: Boolean = false): DataFrame = {
    def prep(c: org.apache.spark.sql.Column) =
      if (normalize) lower(trim(c.cast("string"))) else c.cast("string")
    val u = prep(col(usernameCol))
    val n = prep(col(nameCol))
    pairs
      .withColumn("levenshtein", fuzz_ratio(u, n))   // train_model.py:19 uses fuzz.ratio under this name
      .withColumn("partial_ratio", fuzz_partial_ratio(u, n))
      .withColumn("token_set_ratio", fuzz_token_set_ratio(u, n))
      .withColumn("soundex_match", (soundex_jf(u) === soundex_jf(n)).cast("int"))
      .withColumn("metaphone_match", (metaphone(u) === metaphone(n)).cast("int"))
  }

  def pipeline(numTrees: Int = 100, seed: Long = 32L): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols).setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setNumTrees(numTrees).setSeed(seed)
      .setLabelCol("label").setFeaturesCol("features")
    new Pipeline().setStages(Array(assembler, rf))
  }

  /** Train + evaluate with the reference's 70/30 split (seed 32). Returns
    * (model, accuracy). */
  def trainAndEvaluate(labeledPairs: DataFrame): (PipelineModel, Double) = {
    val feats = buildFeatures(labeledPairs).withColumn("label", col("label").cast("double"))
    val Array(train, test) = feats.randomSplit(Array(0.7, 0.3), seed = 32L)
    val model = pipeline().fit(train)
    val predictions = model.transform(test)
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction").setMetricName("accuracy")
      .evaluate(predictions)
    (model, acc)
  }

  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)
}
