package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch
import graft.streaming.AnnServing

/** Streaming ANN serving == batch PQ search: micro-batch boundaries must
  * not change any neighbor set (a query's answer depends only on the
  * corpus), and restarts / replays must not duplicate output rows. */
class AnnServingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streamed query batches' union equals one batch-mode pqKnn") {
    val corpus = spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
    val queries = corpus.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    val base = java.nio.file.Files.createTempDirectory("graft_ann_serve").toString
    try {
      queries.repartition(3).write.parquet(s"$base/src")
      val builds0 = SimilaritySearch.codebookBuilds.get()
      val tally = AnnServing.annStreaming(spark, s"$base/src", corpus,
        s"$base/out", s"$base/ckpt")

      val streamed = spark.read.parquet(s"$base/out")
      assert(streamed.select("batch_id").distinct().count() > 1,
        "expected multiple micro-batches")
      // THE serving contract: the PQ index is built once per run, never per
      // micro-batch — multiple batches, exactly one codebook collect.
      // Primary evidence is the run's OWN tally (no global-quiescence
      // assumption); the global-counter delta stays as a regression tripwire
      // for a rebuild sneaking into foreachBatch (suites run sequentially
      // in the forked test JVM, so the delta is stable here).
      assert(tally === 1L, "PQ index must be built exactly once per serving run")
      assert(SimilaritySearch.codebookBuilds.get() - builds0 === 1L,
        "no codebook build may happen inside the micro-batch loop")
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select(col("query_id"), col("vec_id"), round(col("cosine"), 9), col("rn"))
        .as[(Long, Long, Double, Int)].collect().sorted.toSeq
      val got = key(streamed)
      val want = key(SimilaritySearch.pqKnn(corpus, queries, 5))
      assert(want.nonEmpty)
      assert(got === want, "micro-batch boundaries changed neighbor sets")

      // restart on the same checkpoint: no new files -> no new output
      AnnServing.annStreaming(spark, s"$base/src", corpus, s"$base/out", s"$base/ckpt")
      assert(key(spark.read.parquet(s"$base/out")) === want,
        "restart replayed already-served batches")

      // worst-case at-least-once replay (fresh checkpoint, same batch ids):
      // per-batch overwrite dirs absorb it (same-config requirement applies)
      AnnServing.annStreaming(spark, s"$base/src", corpus, s"$base/out", s"$base/ckpt2")
      assert(key(spark.read.parquet(s"$base/out")) === want,
        "full replay must overwrite, never duplicate")

      val served = AnnServing.readServed(spark, s"$base/out")
      assert(served.schema("batch_id").dataType ===
        org.apache.spark.sql.types.LongType)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("SQ8 serving: one scale build per run, streamed union == batch sq8Knn") {
    val corpus = spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
    val queries = corpus.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val base = java.nio.file.Files.createTempDirectory("graft_sq8_serve").toString
    try {
      queries.repartition(3).write.parquet(s"$base/src")
      val global0 = SimilaritySearch.scaleBuilds.get()
      val tally = AnnServing.annStreamingSq8(spark, s"$base/src", corpus,
        s"$base/out", s"$base/ckpt")
      val streamed = spark.read.parquet(s"$base/out")
      assert(streamed.select("batch_id").distinct().count() > 1,
        "expected multiple micro-batches")
      // the serving contract: scales derived once per run, never per batch
      assert(tally === 1L, "SQ8 scales must be built exactly once per run")
      assert(SimilaritySearch.scaleBuilds.get() - global0 === 1L,
        "no scale collect may happen inside the micro-batch loop")
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select(col("query_id"), col("vec_id"), round(col("cosine"), 9), col("rn"))
        .as[(Long, Long, Double, Int)].collect().sorted.toSeq
      val got = key(streamed)
      val want = key(SimilaritySearch.sq8Knn(corpus, queries, 5))
      assert(want.nonEmpty && got === want,
        "micro-batch boundaries changed SQ8 neighbor sets")
      // pre-derived scales: zero in-run builds, same answers
      val scales = SimilaritySearch.sq8Scales(corpus)
      val tally2 = AnnServing.annStreamingSq8(spark, s"$base/src", corpus,
        s"$base/out2", s"$base/ckpt2", scales0 = Some(scales))
      assert(tally2 === 0L, "persisted scales must mean zero in-run builds")
      assert(key(spark.read.parquet(s"$base/out2")) === want)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("growing SQ8 index: stream over a growing corpus == sequential indexed batches; scales frozen at seed") {
    import graft.streaming.VectorIngest
    val emb = spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
    val tenth = pmod(col("vec_id"), lit(10))
    val baseCorpus = emb.filter(tenth < 7)
    val growA = emb.filter(tenth.isin(7, 8))
    val growB = emb.filter(tenth === 9)
    val queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("vec_id"), round(col("cosine"), 9), col("rn"))
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq

    val base = java.nio.file.Files.createTempDirectory("graft_sq8_grow").toString
    try {
      // two growth-batch files, mtime-pinned so file->batch order is A, B
      def parts() = new java.io.File(s"$base/src").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .toSet
      growA.coalesce(1).write.parquet(s"$base/src")
      val pA = parts()
      growB.coalesce(1).write.mode("append").parquet(s"$base/src")
      (parts() -- pA).foreach(f => java.nio.file.Files.setLastModifiedTime(
        f.toPath, java.nio.file.attribute.FileTime.fromMillis(1700000005000L)))
      pA.foreach(f => java.nio.file.Files.setLastModifiedTime(
        f.toPath, java.nio.file.attribute.FileTime.fromMillis(1700000000000L)))

      val scales = VectorIngest.seedSq8(baseCorpus, s"$base/idx", s"$base/scales")
      // frozen scales round-trip parquet exactly
      assert(VectorIngest.readScales(spark, s"$base/scales").toSeq === scales.toSeq)

      val global0 = SimilaritySearch.scaleBuilds.get()
      VectorIngest.annStreamingSq8Grow(spark, s"$base/src", queries,
        s"$base/idx", s"$base/scales", s"$base/out", s"$base/ckpt")
      // serving NEVER re-derives scales — the index build stays at seed time
      assert(SimilaritySearch.scaleBuilds.get() === global0,
        "no scale collect may happen inside the growing-serve loop")

      val out = spark.read.parquet(s"$base/out")
      val batchIds = out.select("batch_id").distinct().as[Long].collect().sorted
      assert(batchIds.toSeq === Seq(0L, 1L), "expected two micro-batches")
      val gotAll = key(out) // materialize BEFORE the replay overwrites the dir

      // growth parity: each streamed batch's results == sequential
      // admitVectorBatch + knnIndexed in fresh dirs, batches derived from
      // the persisted index partitions (not assumed from mtime order)
      VectorIngest.seedSq8(baseCorpus, s"$base/sidx", s"$base/sscales")
      for (b <- batchIds) {
        val ids = spark.read.parquet(s"$base/idx")
          .filter(col("batch_id") === b).select("vec_id").as[Long].collect()
        val batch = emb.filter(col("vec_id").isin(ids: _*))
        VectorIngest.admitVectorBatch(spark, batch, b, s"$base/sidx", s"$base/sscales")
        val want = key(VectorIngest.knnIndexed(spark, s"$base/sidx",
          s"$base/sscales", queries, 5, uptoBatch = b))
        assert(key(out.filter(col("batch_id") === b)) === want,
          s"stream batch $b diverged from sequential indexed admission")
      }

      // final disk state == one batch-mode sq8Knn over the FULL corpus
      // with the seed-frozen scales (the code*scale == dequant identity)
      val want = key(SimilaritySearch.sq8Knn(emb, queries, 5,
        scales0 = Some(scales)))
      assert(want.nonEmpty)
      assert(key(VectorIngest.knnIndexed(spark, s"$base/idx", s"$base/scales",
        queries, 5)) === want, "grown index diverged from batch sq8Knn")

      // the growth matters: serving the seed alone answers differently
      // (grown vectors win some top-5 slots), so the parity above is not
      // vacuous
      assert(key(VectorIngest.knnIndexed(spark, s"$base/idx", s"$base/scales",
        queries, 5, uptoBatch = -1L)) !== want,
        "growth batches changed no answer — fixture too weak")

      // worst-case replay (fresh checkpoint): batch 0 clears admitted
      // partitions and the run recomputes byte-stable results and index
      VectorIngest.annStreamingSq8Grow(spark, s"$base/src", queries,
        s"$base/idx", s"$base/scales", s"$base/out", s"$base/ckpt2")
      assert(key(spark.read.parquet(s"$base/out")) === gotAll,
        "fresh-checkpoint replay changed served results")
      assert(key(VectorIngest.knnIndexed(spark, s"$base/idx", s"$base/scales",
        queries, 5)) === want, "fresh-checkpoint replay changed index state")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("growing IVF,SQ8 index: stream == sequential; grown state == batch ivfSq8Knn on the frozen artifacts; cell-partitioned layout") {
    import graft.streaming.VectorIngest
    val emb = spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
    val tenth = pmod(col("vec_id"), lit(10))
    val baseCorpus = emb.filter(tenth < 7)
    val growA = emb.filter(tenth.isin(7, 8))
    val growB = emb.filter(tenth === 9)
    val queries = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("vec_id"), round(col("cosine"), 9), col("rn"))
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq

    val base = java.nio.file.Files.createTempDirectory("graft_ivf_grow").toString
    try {
      def parts() = new java.io.File(s"$base/src").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .toSet
      growA.coalesce(1).write.parquet(s"$base/src")
      val pA = parts()
      growB.coalesce(1).write.mode("append").parquet(s"$base/src")
      (parts() -- pA).foreach(f => java.nio.file.Files.setLastModifiedTime(
        f.toPath, java.nio.file.attribute.FileTime.fromMillis(1700000005000L)))
      pA.foreach(f => java.nio.file.Files.setLastModifiedTime(
        f.toPath, java.nio.file.attribute.FileTime.fromMillis(1700000000000L)))

      val (scales, cents) = VectorIngest.seedIvfSq8(baseCorpus,
        s"$base/idx", s"$base/scales", s"$base/cents")
      // frozen artifacts round-trip parquet exactly (scales: doubles,
      // centroids: floats + ids)
      assert(VectorIngest.readScales(spark, s"$base/scales").toSeq === scales.toSeq)
      val centsBack = VectorIngest.readCentroids(spark, s"$base/cents")
      assert(centsBack.map(_._1).toSeq === cents.map(_._1).toSeq)
      assert(centsBack.map(_._2.toSeq).toSeq === cents.map(_._2.toSeq).toSeq)
      // the coarse quantizer derives from the SEED, not the full corpus
      assert(cents.map(_._1).toSet ===
        baseCorpus.orderBy("vec_id").limit(16).select("vec_id").as[Long].collect().toSet)

      VectorIngest.annStreamingIvfSq8Grow(spark, s"$base/src", queries,
        s"$base/idx", s"$base/scales", s"$base/cents", s"$base/out", s"$base/ckpt")
      val out = spark.read.parquet(s"$base/out")
      assert(out.select("batch_id").distinct().as[Long].collect().sorted.toSeq
        === Seq(0L, 1L), "expected two micro-batches")

      // grown state == one batch-mode ivfSq8Knn over the FULL corpus with
      // the seed-frozen scales AND centroids (codes*scale == dequant;
      // persisted cell == cellExpr of the raw vector)
      val want = key(SimilaritySearch.ivfSq8Knn(emb, queries, 5,
        centroids = Some(cents), scales0 = Some(scales)))
      assert(want.nonEmpty)
      assert(key(VectorIngest.knnIndexedIvf(spark, s"$base/idx",
        s"$base/scales", s"$base/cents", queries, 5)) === want,
        "grown IVF index diverged from batch ivfSq8Knn")
      // the last streamed batch served the full grown state
      assert(key(out.filter(col("batch_id") === 1L)) === want,
        "final streamed serve diverged from the grown state")
      // growth is not vacuous: the seed alone answers differently
      assert(key(VectorIngest.knnIndexedIvf(spark, s"$base/idx",
        s"$base/scales", s"$base/cents", queries, 5, uptoBatch = -1L)) !== want,
        "growth batches changed no answer — fixture too weak")

      // the disk layout is the servable artifact: every batch dir is
      // hive-partitioned by cell, so a probe prunes to its cells' files
      for (b <- Seq("-1", "0", "1")) {
        val cellDirs = new java.io.File(s"$base/idx/batch_id=$b").listFiles()
          .filter(_.isDirectory).map(_.getName)
        assert(cellDirs.nonEmpty && cellDirs.forall(_.startsWith("cell=")),
          s"batch $b is not cell-partitioned: ${cellDirs.mkString(",")}")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("serving on PRE-TRAINED codebooks: zero in-run builds, union == batch") {
    val corpus = spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
    val queries = corpus.filter(pmod(col("vec_id"), lit(50)) === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    val base = java.nio.file.Files.createTempDirectory("graft_ann_trained").toString
    try {
      queries.repartition(3).write.parquet(s"$base/src")
      // train ONCE, offline — the index artifact a deployment would ship
      val books = SimilaritySearch.pqCodebooksTrained(corpus, m = 8, ksub = 16,
        sampleFraction = Some(0.5))
      val builds0 = SimilaritySearch.codebookBuilds.get()
      val tally = AnnServing.annStreaming(spark, s"$base/src", corpus,
        s"$base/out", s"$base/ckpt", books0 = Some(books))
      assert(tally === 0L, "pre-trained serving run must not build an index")
      assert(SimilaritySearch.codebookBuilds.get() === builds0,
        "no codebook build may happen anywhere inside the serving run")

      val streamed = spark.read.parquet(s"$base/out")
      assert(streamed.select("batch_id").distinct().count() > 1,
        "expected multiple micro-batches")
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select(col("query_id"), col("vec_id"), round(col("cosine"), 9), col("rn"))
        .as[(Long, Long, Double, Int)].collect().sorted.toSeq
      val want = key(SimilaritySearch.pqKnn(corpus, queries, 5, books = Some(books)))
      assert(want.nonEmpty)
      assert(key(streamed) === want,
        "trained-books serving must equal batch pqKnn on the same books")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
