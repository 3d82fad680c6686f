package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dsir, TextAnalysis}
import graft.streaming.{ContaminationGate, CurationPipeline, DsirServing}

/** The one-pass curation stream must equal the composition of its two
  * constituent serving operators (gate ∘ score), train/build each
  * artifact at most once, and keep verdicts invariant to micro-batch
  * boundaries. */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import SparkTestBase.Sf0001

  test("one-pass verdicts == gate ∘ score composition; artifacts build once") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val probe = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val incoming = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .select("doc_id", "text")
    val model = Dsir.trainModel(docs, "text", col("lang") === "en", 4096)
    val sketch = TextAnalysis.evalGramSketch(probe, "text", "doc_id")
    // threshold = the 100th-best LLR among CLEAN incoming docs, so the
    // fixture is guaranteed to exercise selected AND rejected alongside
    // the quarantined class
    val thr = incoming
      .select(TextAnalysis.suspectGramCount(col("text"), sketch, 3).as("susp"),
        coalesce(graft.functions.dsir_score(
          Dsir.featureBuckets(col("text"), model.buckets), model.llr), lit(0L)).as("llr"))
      .where(col("susp") === 0L)
      .orderBy(col("llr").desc).limit(100)
      .agg(min("llr")).head().getLong(0)

    val base = java.nio.file.Files.createTempDirectory("graft_curate").toString
    try {
      incoming.repartition(3).write.parquet(s"$base/src")
      val (trained, sketched) = CurationPipeline.curateStreaming(spark,
        s"$base/src", docs, col("lang") === "en", probe,
        s"$base/out", s"$base/ckpt", thresholdFp = thr)
      assert(trained === 1L && sketched === 1L,
        "each artifact must build exactly once per run")

      val curated = spark.read.parquet(s"$base/out")
      assert(curated.select("batch_id").distinct().count() > 1)
      assert(curated.count() === incoming.count(), "every incoming doc gets a verdict")

      // composition reference: run the two serving operators separately
      // (pre-built artifacts) and stitch their outputs
      ContaminationGate.gateStreaming(spark, s"$base/src", probe,
        s"$base/gate_out", s"$base/gate_ckpt", sketch0 = Some(sketch))
      DsirServing.dsirStreaming(spark, s"$base/src", docs,
        col("lang") === "en", s"$base/score_out", s"$base/score_ckpt",
        thresholdFp = thr, model0 = Some(model))
      val gate = spark.read.parquet(s"$base/gate_out")
        .select("doc_id", "n_suspect_grams", "quarantined")
      val score = spark.read.parquet(s"$base/score_out")
        .select("doc_id", "n_feats", "llr_fp", "selected")
      val composed = gate.join(score, "doc_id")
        .select(col("doc_id"), col("n_suspect_grams"), col("n_feats"), col("llr_fp"),
          when(col("quarantined"), "quarantined")
            .when(col("selected"), "selected")
            .otherwise("rejected").as("verdict"))
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id", "n_suspect_grams", "n_feats", "llr_fp", "verdict")
        .as[(Long, Long, Long, Long, String)].collect().sorted.toSeq
      assert(key(curated) === key(composed),
        "one-pass curation diverged from the operator composition")

      // the stream actually exercises all three verdict classes
      val classes = curated.select("verdict").distinct().as[String].collect().toSet
      assert(classes === Set("quarantined", "selected", "rejected"),
        s"fixture must exercise every verdict, got $classes")

      // pre-built artifacts: zero builds, identical verdicts
      val (t2, s2) = CurationPipeline.curateStreaming(spark, s"$base/src",
        docs, col("lang") === "en", probe, s"$base/out2", s"$base/ckpt2",
        thresholdFp = thr, model0 = Some(model), sketch0 = Some(sketch))
      assert(t2 === 0L && s2 === 0L)
      assert(key(spark.read.parquet(s"$base/out2")) === key(curated))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("streamed shards: single batch reproduces writeCuratedShards byte-for-byte; multi-batch packs per batch") {
    import graft.operators.{Curation, Dsir, TextAnalysis => TA}
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val corpus = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .select("doc_id", "text", "lang")
    val evalDf = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val S = 120L
    val thr = -12L << 30
    val model = Dsir.trainModel(docs, "text", col("lang") === "en", 4096)
    val sketch = TA.evalGramSketch(evalDf, "text", "doc_id")
    val base = java.nio.file.Files.createTempDirectory("graft_stream_shards").toString
    def shardFiles(root: String): Map[String, Array[Byte]] = {
      def walk(f: java.io.File): Iterator[java.io.File] =
        if (f.isDirectory) f.listFiles().iterator.flatMap(walk) else Iterator(f)
      walk(new java.io.File(root))
        .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
        .map { f =>
          val rel = f.getParentFile.getAbsolutePath.stripPrefix(root)
          rel -> java.nio.file.Files.readAllBytes(f.toPath)
        }.toMap
    }
    try {
      // ONE batch: everything through a single trigger
      corpus.coalesce(1).write.parquet(s"$base/src1")
      val readBack = spark.read.parquet(s"$base/src1")
      val (t1, s1) = CurationPipeline.curateStreamingShards(spark,
        s"$base/src1", docs, col("lang") === "en", evalDf, col("lang"),
        s"$base/out1", s"$base/ckpt1", thresholdFp = thr, shardTokens = S,
        maxFilesPerTrigger = 100, model0 = Some(model), sketch0 = Some(sketch),
        schema = readBack.schema)
      assert(t1 === 0L && s1 === 0L, "frozen artifacts must not rebuild")
      val curated = Curation.curateBatch(readBack, evalDf, "text", "doc_id",
        stratum = col("lang"), isTarget = col("lang") === "en",
        thresholdFp = thr, shardTokens = S,
        model0 = Some(model), sketch0 = Some(sketch))
      Curation.writeCuratedShards(readBack, curated, "text", "doc_id", S,
        s"$base/outB")
      val streamed = shardFiles(s"$base/out1/batch_id=0")
      val batch = shardFiles(s"$base/outB")
      assert(batch.nonEmpty, "fixture must produce shards")
      assert(streamed.keySet === batch.keySet,
        s"shard dirs diverged: stream-only ${(streamed.keySet -- batch.keySet).take(3)}, " +
          s"batch-only ${(batch.keySet -- streamed.keySet).take(3)}")
      streamed.foreach { case (rel, bytes) =>
        assert(java.util.Arrays.equals(bytes, batch(rel)),
          s"shard $rel bytes diverged from writeCuratedShards")
      }

      // MULTI batch: per-batch packing, selection batch-invariant — the
      // token multiset across every batch partition equals the batch
      // pipeline's selected-token multiset
      corpus.repartition(3).write.parquet(s"$base/src2")
      CurationPipeline.curateStreamingShards(spark,
        s"$base/src2", docs, col("lang") === "en", evalDf, col("lang"),
        s"$base/out2", s"$base/ckpt2", thresholdFp = thr, shardTokens = S,
        maxFilesPerTrigger = 1, model0 = Some(model), sketch0 = Some(sketch),
        schema = readBack.schema)
      val batchDirs = new java.io.File(s"$base/out2").listFiles()
        .filter(_.getName.startsWith("batch_id=")).map(_.getName)
      assert(batchDirs.length > 1, "source must split into multiple batches")
      def tokenBag(files: Map[String, Array[Byte]]): Map[String, Int] =
        files.values.flatMap(b => new String(b, "UTF-8").trim.split("\\s+"))
          .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.size).toMap
      val want = curated.filter(col("verdict") === "selected")
        .join(readBack.select("doc_id", "text"), "doc_id")
        .select("text").as[String].collect()
        .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(tokenBag(shardFiles(s"$base/out2")) === want,
        "multi-batch shard token multiset diverged from the selected set")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("curated shard files: selected docs in curriculum order, token-exact cuts, full non-final shards") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val corpus = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val evalDf = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val S = 120L
    val curated = graft.operators.Curation.curateBatch(corpus, evalDf,
        "text", "doc_id", stratum = col("lang"),
        isTarget = col("lang") === "en",
        thresholdFp = -12L << 30, shardTokens = S)
      .localCheckpoint()
    val sel = curated.filter(col("verdict") === "selected")
    assert(sel.count() > 5, "fixture must select a handful of docs")

    val out = java.nio.file.Files.createTempDirectory("graft_curated_shards").toString
    try {
      graft.operators.Curation.writeCuratedShards(corpus, curated,
        "text", "doc_id", S, out)
      // the fold: per stratum, selected docs in (llr_fp DESC, id) order,
      // tokens laid end to end, cut every S — shard files must match it
      val rows = sel.select(col("doc_id"), col("stratum"), col("llr_fp"))
        .join(corpus.select(col("doc_id"), col("text")), "doc_id")
        .as[(Long, String, Long, String)].collect()
      rows.groupBy(_._2).foreach { case (stratum, ds) =>
        val toks = ds.sortBy(d => (-d._3, d._1))
          .flatMap(_._4.trim.split("\\s+").filter(_.nonEmpty)).toSeq
        val folds = toks.grouped(S.toInt).toSeq
        folds.zipWithIndex.foreach { case (fold, i) =>
          val dir = new java.io.File(s"$out/stratum=$stratum/shard_id=$i")
          val parts = dir.listFiles().filter(_.getName.startsWith("part-"))
          assert(parts.length === 1, s"expected one file for ($stratum,$i)")
          val content = new String(
            java.nio.file.Files.readAllBytes(parts.head.toPath), "UTF-8").stripLineEnd
          assert(content === fold.mkString(" "),
            s"shard ($stratum,$i) diverged from the curriculum fold")
          if (i < folds.size - 1)
            assert(fold.length === S.toInt, s"non-final shard ($stratum,$i) not full")
        }
        // and no extra shard dirs beyond the fold
        val dirs = new java.io.File(s"$out/stratum=$stratum").listFiles()
          .filter(_.getName.startsWith("shard_id=")).map(_.getName).toSet
        assert(dirs === folds.indices.map(i => s"shard_id=$i").toSet)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
