package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir
import graft.streaming.DsirServing

/** Streaming DSIR serving == batch scoring: a fixed trained model and a
  * fixed lattice threshold make every verdict row-local, so micro-batch
  * boundaries must not change any result; the model trains once per run;
  * an empty source dir must boot (explicit schema). */
class DsirServingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import SparkTestBase.Sf0001

  private def docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  test("streamed batches' union equals one batch-mode scoring; model trains once") {
    val corpus = docs
    val model = Dsir.trainModel(corpus, "text", col("lang") === "en", 4096)
    // threshold = the 100th-best batch weight: selection at serve time
    // reproduces the batch run's top-k cut on the same corpus
    val thr = Dsir.importanceWeights(corpus, "text", "doc_id",
      isTarget = col("lang") === "en", buckets = 4096, topK = 100)
      .where(col("selected")).agg(min("llr_fp")).head().getLong(0)

    val base = java.nio.file.Files.createTempDirectory("graft_dsir_serve").toString
    try {
      corpus.select("doc_id", "text").repartition(3).write.parquet(s"$base/src")
      val tally = DsirServing.dsirStreaming(spark, s"$base/src",
        corpus, col("lang") === "en", s"$base/out", s"$base/ckpt", thresholdFp = thr)
      assert(tally === 1L, "model must train exactly once per serving run")

      val streamed = spark.read.parquet(s"$base/out")
      assert(streamed.select("batch_id").distinct().count() > 1,
        "expected multiple micro-batches")
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id", "n_feats", "llr_fp", "selected")
        .as[(Long, Long, Long, Boolean)].collect().sorted.toSeq
      val got = key(streamed)
      val want = key(Dsir.scoreWithModel(corpus, "text", "doc_id", model)
        .withColumnRenamed("__id", "doc_id")
        .withColumn("selected", col("llr_fp") >= thr))
      assert(want.nonEmpty)
      assert(got === want, "micro-batch boundaries changed scoring results")
      assert(got.count(_._4) === 100,
        "the fixed threshold must reproduce the batch top-k cut exactly")

      // pre-trained model: zero in-run trains, identical results
      val tally2 = DsirServing.dsirStreaming(spark, s"$base/src",
        corpus, col("lang") === "en", s"$base/out2", s"$base/ckpt2",
        thresholdFp = thr, model0 = Some(model))
      assert(tally2 === 0L, "pre-trained model must not retrain in-run")
      assert(key(spark.read.parquet(s"$base/out2")) === want)

      // at-least-once replay absorption: fresh checkpoint, same batch ids
      DsirServing.dsirStreaming(spark, s"$base/src", corpus,
        col("lang") === "en", s"$base/out", s"$base/ckpt3", thresholdFp = thr,
        model0 = Some(model))
      assert(key(spark.read.parquet(s"$base/out")) === want,
        "full replay must overwrite, never duplicate")

      assert(DsirServing.readServed(spark, s"$base/out")
        .schema("batch_id").dataType === org.apache.spark.sql.types.LongType)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("empty-dir bootstrap, then out-of-corpus docs score on the add-one default") {
    val corpus = docs
    val model = Dsir.trainModel(corpus, "text", col("lang") === "en", 4096)
    val base = java.nio.file.Files.createTempDirectory("graft_dsir_boot").toString
    try {
      new java.io.File(s"$base/src").mkdirs()
      // serving process boots BEFORE its producer writes any file: the
      // explicit DocSchema makes the empty dir legal; AvailableNow drains
      // nothing and terminates cleanly
      DsirServing.dsirStreaming(spark, s"$base/src", corpus,
        col("lang") === "en", s"$base/out", s"$base/ckpt",
        thresholdFp = 0L, model0 = Some(model))
      assert(!new java.io.File(s"$base/out").exists() ||
        spark.read.parquet(s"$base/out").count() === 0L)

      // files arrive (vocabulary the corpus has never seen + a null text);
      // unseen buckets carry the smoothed default, null scores (0, 0).
      // The file source lists the dir non-recursively: stage the batch,
      // then move its part files to the source ROOT (the producer
      // contract)
      Seq((9001L, "zzyzx qwfp qwfp xylotomy"), (9002L, null.asInstanceOf[String]))
        .toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/stage")
      new java.io.File(s"$base/stage").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$base/src/${f.getName}")))
      DsirServing.dsirStreaming(spark, s"$base/src", corpus,
        col("lang") === "en", s"$base/out", s"$base/ckpt",
        thresholdFp = 0L, model0 = Some(model))
      val out = spark.read.parquet(s"$base/out")
        .select("doc_id", "n_feats", "llr_fp")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(out.map(_._1) === Seq(9001L, 9002L))
      val novel = out.head
      // 4 unigrams + 3 bigrams = 7 features; every bucket unseen would be
      // 7 * default, but hash collisions with trained buckets may shift
      // individual terms — pin the exact kernel value instead
      assert(novel._2 === 7L)
      val expected = Dsir.scoreWithModel(
        Seq((9001L, "zzyzx qwfp qwfp xylotomy")).toDF("doc_id", "text"),
        "text", "doc_id", model).head()
      assert(novel._3 === expected.getLong(2))
      assert(out(1) === ((9002L, 0L, 0L)), "null text must score (0, 0)")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
