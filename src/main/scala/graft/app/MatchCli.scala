package graft.app

import org.apache.spark.sql.SparkSession
import graft.pipeline.MatchPipeline
import graft.schema.EmployeeNormalizer

/**
 * Thin CLI driver for the flagship match pipeline — the engine's equivalent
 * of the reference's HTTP upload endpoint (/root/reference/main.py:136-221):
 * two CSVs in, ranked-match CSV out.
 *
 * Usage: MatchCli <employees.csv> <usernames.csv> <outDir>
 */
object MatchCli {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: MatchCli <employees.csv> <usernames.csv> <outDir>")
    val Array(employeesPath, usernamesPath, outDir) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-match")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val employeesRaw = spark.read.option("header", "true").csv(employeesPath)
    val employees = EmployeeNormalizer.normalize(employeesRaw)

    val usernamesRaw = spark.read.option("header", "true").csv(usernamesPath)
    val lowered = usernamesRaw.toDF(usernamesRaw.columns.map(_.toLowerCase): _*)
    require(lowered.columns.contains("username"),
      "usernames CSV must contain a 'username' column (main.py:153)")

    val out = MatchPipeline.matchOutput(lowered.select("username"), employees)
    MatchPipeline.writeCsv(out.orderBy("username", "confidence_score"), outDir)
    println(s"[match] wrote ${out.count()} rows to $outDir")
    spark.stop()
  }
}
