package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.streaming.ContaminationGate

/** The streaming decontamination gate must fail closed (no contaminated
  * document ever passes), agree with batch screening across micro-batch
  * boundaries, build its sketch at most once per run, and boot on an
  * empty source dir. */
class ContaminationGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  import SparkTestBase.Sf0001

  test("fail-closed vs exact contamination; union == batch; sketch builds once") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val train = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val probe = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val base = java.nio.file.Files.createTempDirectory("graft_gate").toString
    try {
      train.select("doc_id", "text").repartition(3).write.parquet(s"$base/src")
      val tally = ContaminationGate.gateStreaming(spark, s"$base/src", probe,
        s"$base/out", s"$base/ckpt")
      assert(tally === 1L, "sketch must build exactly once per run")

      val gated = spark.read.parquet(s"$base/out")
      assert(gated.select("batch_id").distinct().count() > 1,
        "expected multiple micro-batches")
      // fail-closed: every truly contaminated doc (exact pass) quarantined
      val contaminated = TextAnalysis.contamination(train, probe, "text", "doc_id")
        .select("doc_id").as[Long].collect().toSet
      val quarantined = gated.where(col("quarantined"))
        .select("doc_id").as[Long].collect().toSet
      assert(contaminated.nonEmpty)
      assert((contaminated -- quarantined).isEmpty,
        s"contaminated docs passed the gate: ${(contaminated -- quarantined).take(5)}")

      // union == batch: the same row-local screen over the whole train set
      val sketch = TextAnalysis.evalGramSketch(probe, "text", "doc_id")
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select("doc_id", "n_suspect_grams", "quarantined")
        .as[(Long, Long, Boolean)].collect().sorted.toSeq
      val want = key(train.select(col("doc_id"),
          TextAnalysis.suspectGramCount(col("text"), sketch).as("n_suspect_grams"))
        .withColumn("quarantined", col("n_suspect_grams") > 0L))
      assert(key(gated) === want, "micro-batch boundaries changed gate verdicts")

      // pre-built sketch: zero in-run builds, identical verdicts
      val tally2 = ContaminationGate.gateStreaming(spark, s"$base/src", probe,
        s"$base/out2", s"$base/ckpt2", sketch0 = Some(sketch))
      assert(tally2 === 0L)
      assert(key(spark.read.parquet(s"$base/out2")) === want)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("provably-clean documents pass; empty source dir boots") {
    val probe = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_gate_clean").toString
    try {
      new java.io.File(s"$base/src").mkdirs()
      // boots with zero files (explicit schema), terminates cleanly
      val sketch = TextAnalysis.evalGramSketch(probe, "text", "doc_id")
      ContaminationGate.gateStreaming(spark, s"$base/src", probe,
        s"$base/out", s"$base/ckpt", sketch0 = Some(sketch))
      assert(!new java.io.File(s"$base/out").exists() ||
        spark.read.parquet(s"$base/out").count() === 0L)

      Seq((1L, "alpha beta gamma delta epsilon"),     // disjoint vocab: clean
          (2L, "quick brown fox jumps somewhere"),    // shares 'quick brown fox'
          (3L, null.asInstanceOf[String]))            // null: clean, 0 grams
        .toDF("doc_id", "text").coalesce(1).write.parquet(s"$base/stage")
      new java.io.File(s"$base/stage").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$base/src/${f.getName}")))
      ContaminationGate.gateStreaming(spark, s"$base/src", probe,
        s"$base/out", s"$base/ckpt", sketch0 = Some(sketch))
      val out = spark.read.parquet(s"$base/out")
        .select("doc_id", "n_suspect_grams", "quarantined")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      assert(out.map(_._1) === Seq(1L, 2L, 3L))
      assert(out(0) === ((1L, 0L, false)), "disjoint vocab must pass clean")
      assert(out(1)._2 >= 1L && out(1)._3, "shared gram must quarantine")
      assert(out(2) === ((3L, 0L, false)), "null text must pass clean")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
