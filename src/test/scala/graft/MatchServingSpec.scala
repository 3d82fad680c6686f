package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.MatchPipeline
import graft.schema.EmployeeNormalizer
import graft.streaming.MatchServing

/** Streaming match serving == batch match: micro-batch boundaries must not
  * change any verdict (a username's answer depends only on the roster), and
  * restarts / replays must not duplicate output rows. */
class MatchServingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streamed username batches' union equals one batch-mode matchOutput") {
    val employees = EmployeeNormalizer.normalize(
      spark.read.option("header", "true").csv("/root/reference/employee.csv"))
    val usernames = spark.read.option("header", "true")
      .csv("/root/reference/usernames.csv")
      .select(col("Username").as("username"))

    val base = java.nio.file.Files.createTempDirectory("graft_serve").toString
    try {
      // several source files -> maxFilesPerTrigger=1 forces >1 micro-batch
      usernames.repartition(4).write.parquet(s"$base/src")
      MatchServing.matchStreaming(spark, s"$base/src", employees,
        s"$base/out", s"$base/ckpt")

      val streamed = spark.read.parquet(s"$base/out")
      assert(streamed.select("batch_id").distinct().count() > 1,
        "expected multiple micro-batches")
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select("username", "emp_id", "emp_name", "confidence_score", "match_type")
        .as[(String, String, String, String, String)].collect().sorted.toSeq
      val got = key(streamed)
      val want = key(MatchPipeline.matchOutput(usernames, employees))
      assert(got === want, "micro-batch boundaries changed match results")

      // restart on the same checkpoint: no new files -> no new output
      MatchServing.matchStreaming(spark, s"$base/src", employees,
        s"$base/out", s"$base/ckpt")
      assert(key(spark.read.parquet(s"$base/out")) === want,
        "restart replayed already-served batches")

      // worst-case at-least-once replay (fresh checkpoint, same batch ids):
      // per-batch overwrite dirs absorb it — identical content, no dupes.
      // NOTE the scaladoc's same-config requirement: this only holds because
      // the source file set, listing order, and maxFilesPerTrigger are
      // unchanged; a different trigger config must use a clean outDir
      MatchServing.matchStreaming(spark, s"$base/src", employees,
        s"$base/out", s"$base/ckpt2")
      assert(key(spark.read.parquet(s"$base/out")) === want,
        "full replay must overwrite, never duplicate")

      // reader contract: partition discovery + pinned LONG batch_id
      val served = MatchServing.readServed(spark, s"$base/out")
      assert(served.schema("batch_id").dataType ===
        org.apache.spark.sql.types.LongType)
      assert(served.columns.toSet === Set("username", "emp_id", "emp_name",
        "confidence_score", "match_type", "batch_id"))

      // maxFilesPerTrigger > 1: fewer micro-batches, identical verdicts
      // (fresh out/ckpt dirs — a changed trigger config must not reuse them)
      MatchServing.matchStreaming(spark, s"$base/src", employees,
        s"$base/out_mft2", s"$base/ckpt_mft2", maxFilesPerTrigger = 2)
      val mft2 = spark.read.parquet(s"$base/out_mft2")
      // fresh read: `streamed`'s file listing is stale after the replays
      val nBatches1 = spark.read.parquet(s"$base/out")
        .select("batch_id").distinct().count()
      assert(mft2.select("batch_id").distinct().count() < nBatches1,
        "maxFilesPerTrigger=2 should coalesce source files into fewer batches")
      assert(key(mft2) === want,
        "maxFilesPerTrigger must not change any verdict")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(base))
    }
  }
}
