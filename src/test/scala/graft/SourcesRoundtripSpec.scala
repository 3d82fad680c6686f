package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.schema.EmployeeNormalizer

/** Source/sink format breadth: the canonical roster must survive a write +
  * read roundtrip through every format the engine's sinks target. CSV/JSON
  * are schema-on-read (string-typed canonical shape makes them lossless
  * here); parquet/ORC carry the schema. */
class SourcesRoundtripSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val roster = EmployeeNormalizer.normalize(
    spark.read.option("header", "true").csv("/root/reference/employee.csv"))

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(String, String, String, String)] =
    df.select("emp_id", "first_name", "last_name", "employee_name")
      .as[(String, String, String, String)].collect().toSet

  test("canonical roster roundtrips through parquet, orc, json, and csv") {
    val expected = asSet(roster)
    assert(expected.nonEmpty)
    val base = java.nio.file.Files.createTempDirectory("graft_formats").toString
    try {
      for (fmt <- Seq("parquet", "orc", "json", "csv")) {
        val path = s"$base/$fmt"
        val writer = roster.write.mode("overwrite").format(fmt)
        (if (fmt == "csv") writer.option("header", "true") else writer).save(path)
        val reader = spark.read.format(fmt)
        val back =
          if (fmt == "csv") reader.option("header", "true").schema(roster.schema).load(path)
          else reader.load(path)
        assert(asSet(back) === expected, s"roundtrip through $fmt lost rows")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("hive-partitioned layout: a partition predicate prunes at plan time, not scan time") {
    // the 100 TB layout contract: a corpus written partitionBy(key) must
    // turn an equality predicate on the key into a PartitionFilter (metadata
    // pruning — untouched partitions contribute ZERO files to the scan),
    // not a PushedFilter evaluated against row groups of every file
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = graft.sources.Tables.events(spark, SparkTestBase.Sf0001)
    events.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"partition predicate did not become a PartitionFilter:\n$plan")
    // parity: pruning must not change the answer
    val expected = events.filter(col("event_type") === "click").count()
    assert(pruned.count() === expected)
    assert(expected > 0)
  }
}
