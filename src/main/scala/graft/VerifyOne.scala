package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Developer utility: dump ONE named SparkEntry query + its oracle SQL
  * without paying for the full Verify sweep — the single-query analog of
  * [[BenchOne]] for the correctness loop.
  *
  *   sbt "runMain graft.VerifyOne dd_cand_audit /root/testdata/sf0.01 /tmp/v1"
  *
  * Writes `outDir/<name>/` (parquet) and `outDir/oracle_sql.json` holding
  * just this query's oracle, so tools/oracle_check.py checks it alone:
  *
  *   python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/v1
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    // same escaping contract as Verify.main
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.get(name)
      .map(sql => s"{${q(name)}: ${q(sql)}}").getOrElse("{}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
