package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.QualityModel
import graft.ml.QualityModel.QualityLr

/** The learned quality filter: training reproducibility (the M3 protocol —
  * seed-32 split, accuracy band, structure assertions rather than bitwise
  * optimizer equality) and the frozen-weight scan scoring's exact
  * equivalence to the MLlib model it froze. */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** The pinned weights the tx_quality_model query serves (trained by
    * graft.TrainQualityModel on sf0.01, DSIR-verdict label). */
  private val Pinned = QualityLr(8.326934740234663, -14.82125182987177,
    -0.6157986576015968, 0.0, -0.006613304388355227)

  private def dsirLabeled(dir: String) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.operators.Dsir.trainModel(docs, "text",
      col("lang") === "en", 4096)
    docs.withColumn("__dsir_sel",
      coalesce(graft.functions.dsir_score(
        graft.operators.Dsir.featureBuckets(col("text"), model.buckets),
        model.llr), lit(0L)) >= lit(-10L << 30))
  }

  test("training reproduces the pinned model: accuracy band, weight structure, decision agreement") {
    val labeled = dsirLabeled(SparkTestBase.Sf001).localCheckpoint()
    val (w, acc) = QualityModel.train(labeled, "text", "doc_id", col("__dsir_sel"))
    // the distillation must actually work: DSIR accumulates negative LLR
    // mass per gram, so its verdict is strongly length-driven — the cheap
    // feature model recovers it well above the 56% majority class
    assert(acc >= 0.8, s"held-out accuracy $acc below the band")
    // structure, not bitwise optimizer equality: token length dominates
    // and is negative (longer docs are more negative in LLR)
    assert(w.wTokens < -5.0, s"token weight lost its structure: $w")
    assert(math.abs(w.intercept - Pinned.intercept) < 1e-3 &&
      math.abs(w.wTokens - Pinned.wTokens) < 1e-3,
      s"retrained weights drifted from the pin: $w vs $Pinned")
    // frozen-pin decisions agree with the fresh model on ~every document
    val frozenKeep = QualityModel.score(labeled, "text", "doc_id", Pinned)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val freshKeep = QualityModel.score(labeled, "text", "doc_id", w)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val agree = frozenKeep.count { case (id, k) => freshKeep(id) == k }
    assert(agree >= (frozenKeep.size * 0.99).toInt,
      s"pinned vs retrained verdicts agree on only $agree/${frozenKeep.size}")
  }

  test("frozen-weight scan scoring == the MLlib model's raw prediction (no train/serve skew)") {
    val labeled = dsirLabeled(SparkTestBase.Sf001).localCheckpoint()
    // fit on the full frame so transform covers every doc deterministically
    val feats = QualityModel.featureFrame(labeled, "text", "doc_id")
      .join(labeled.select(col("doc_id"),
        col("__dsir_sel").cast("double").as("__label")), "doc_id")
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(QualityModel.FeatureCols).setOutputCol("features")
      .transform(feats)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(100).setRegParam(0.0)
      .setLabelCol("__label").setFeaturesCol("features")
    val model = lr.fit(assembled)
    val w = QualityLr(model.intercept, model.coefficients(0),
      model.coefficients(1), model.coefficients(2), model.coefficients(3))
    val mlRaw = model.transform(assembled)
      .select(col("doc_id"), col("rawPrediction"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1)(1))
      .toMap
    val scanLogit = QualityModel.score(labeled, "text", "doc_id", w)
      .select("doc_id", "logit").as[(Long, Double)].collect().toMap
    assert(scanLogit.size === mlRaw.size)
    scanLogit.foreach { case (id, l) =>
      val m = mlRaw(id)
      assert(math.abs(l - m) <= 1e-9 * math.max(1.0, math.abs(m)),
        s"doc $id: scan logit $l != model raw $m")
    }
  }

  test("zero-token and null-text documents are rejected, score finite logits, never crash") {
    val docs = Seq((1L, "the cat sat on the mat with a hat"), (2L, ""),
      (3L, null.asInstanceOf[String]), (4L, "   "))
      .toDF("doc_id", "text")
    val got = QualityModel.score(docs, "text", "doc_id", Pinned)
      .select("doc_id", "logit", "keep")
      .as[(Long, Option[Double], Option[Boolean])].collect()
      .map(r => r._1 -> r).toMap
    // empty/whitespace docs: every feature is 0, logit = intercept — but
    // the verdict REJECTS them (explicit zero-token rule; with all feature
    // weights <= 0 the intercept alone would otherwise admit empty docs)
    for (id <- Seq(2L, 4L)) {
      assert(got(id)._2.contains(Pinned.intercept), s"doc $id logit")
      assert(got(id)._3.contains(false), s"doc $id must be rejected (zero tokens)")
    }
    assert(got(1L)._2.exists(l => !l.isNaN && !l.isInfinite))
    assert(got(1L)._3.contains(true), "real doc above threshold stays kept")
    // NULL text: length(NULL) is NULL -> features NULL -> logit NULL,
    // visible rather than silently kept
    assert(got(3L)._2.isEmpty && got(3L)._3.isEmpty)
  }
}
