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
    val (model, predictions) = trainAndPredict(labeledPairs)
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction").setMetricName("accuracy")
      .evaluate(predictions)
    (model, acc)
  }

  /** Same protocol as [[trainAndEvaluate]] but returns the held-out test
    * predictions for metric surfaces beyond accuracy. */
  def trainAndPredict(labeledPairs: DataFrame): (PipelineModel, DataFrame) = {
    val feats = buildFeatures(labeledPairs).withColumn("label", col("label").cast("double"))
    val Array(train, test) = feats.randomSplit(Array(0.7, 0.3), seed = 32L)
    val model = pipeline().fit(train)
    (model, model.transform(test))
  }

  /** sklearn `classification_report` surface (train_model.py:46): one row
    * per class label with precision / recall / f1 / support, plus the
    * `accuracy`, `macro avg`, and `weighted avg` summary rows. The heavy
    * pass is ONE narrow (label, prediction) count aggregate — the confusion
    * matrix — whose row count is numClasses squared; deriving the report
    * from those few rows on the driver is dimension-table work, the same
    * documented trade as the IVF centroid collect. Zero-denominator cells
    * (a class never predicted) report 0.0, matching sklearn's
    * zero_division=0 default. */
  def classificationReport(predictions: DataFrame,
                           labelCol: String = "label",
                           predictionCol: String = "prediction"): DataFrame = {
    val spark = predictions.sparkSession
    val cm = predictions
      .groupBy(col(labelCol).cast("double").as("label"),
        col(predictionCol).cast("double").as("prediction"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getDouble(0), r.getDouble(1)), r.getLong(2))).toMap
    val classes = cm.keysIterator.flatMap { case (l, p) => Iterator(l, p) }.toSeq.distinct.sorted
    val total = cm.valuesIterator.sum
    def safeDiv(a: Long, b: Long): Double = if (b == 0L) 0.0 else a.toDouble / b
    val perClass = classes.map { c =>
      val tp = cm.getOrElse((c, c), 0L)
      val predicted = cm.collect { case ((_, p), n) if p == c => n }.sum
      val actual = cm.collect { case ((l, _), n) if l == c => n }.sum
      val precision = safeDiv(tp, predicted)
      val recall = safeDiv(tp, actual)
      val f1 = if (precision + recall == 0.0) 0.0
               else 2.0 * precision * recall / (precision + recall)
      (formatLabel(c), precision, recall, f1, actual)
    }
    val accuracy = safeDiv(classes.map(c => cm.getOrElse((c, c), 0L)).sum, total)
    val macroAvg = (
      perClass.map(_._2).sum / perClass.size, perClass.map(_._3).sum / perClass.size,
      perClass.map(_._4).sum / perClass.size)
    val weighted = (
      perClass.map(r => r._2 * r._5).sum / total, perClass.map(r => r._3 * r._5).sum / total,
      perClass.map(r => r._4 * r._5).sum / total)
    import spark.implicits._
    (perClass ++ Seq(
      ("accuracy", accuracy, accuracy, accuracy, total),
      ("macro avg", macroAvg._1, macroAvg._2, macroAvg._3, total),
      ("weighted avg", weighted._1, weighted._2, weighted._3, total)))
      .toDF("label", "precision", "recall", "f1", "support")
  }

  private def formatLabel(c: Double): String =
    if (c == c.toLong.toDouble) c.toLong.toString else c.toString

  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)
}
