package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{MatchBlocking, MatchPipeline}
import graft.schema.EmployeeNormalizer

/** Recall of the blocked (candidate-key) match path vs the exact cross-join
  * pipeline on the full reference workload. Blocking is the 100 TB scale
  * path (SURVEY.md §4.2) and is allowed to miss purely-fuzzy matches — this
  * spec pins HOW MUCH it may miss, and that the score-100 pattern tier is
  * captured exactly. */
class MatchBlockingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val employees = EmployeeNormalizer.normalize(
    spark.read.option("header", "true").csv("/root/reference/employee.csv"))
  private lazy val usernames = spark.read.option("header", "true")
    .csv("/root/reference/usernames.csv").select("username")

  private def foundPairs(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.filter(col("match_type") =!= "USER NOT FOUND")
      .select("username", "emp_id").as[(String, String)].collect().toSet

  test("blocked match path recalls >= 90% of exact matches; pattern tier is exact") {
    val exact = foundPairs(MatchPipeline.matchOutput(usernames, employees))
    val blocked = foundPairs(MatchBlocking.matchOutput(usernames, employees))
    val recall = blocked.intersect(exact).size.toDouble / exact.size
    info(f"blocking recall: $recall%.4f (${blocked.intersect(exact).size}/${exact.size})")
    assert(recall >= 0.90, f"recall $recall%.4f below 0.90")

    // every 100.00% (pattern short-circuit) row must survive blocking: the
    // username itself is one of its blocking keys
    val exactPattern = MatchPipeline.matchOutput(usernames, employees)
      .filter(col("confidence_score") === "100.00%")
      .select("username", "emp_id").as[(String, String)].collect().toSet
    assert(exactPattern.subsetOf(blocked),
      s"pattern-tier pairs lost by blocking: ${exactPattern -- blocked}")
  }

  test("candidate volume is a small fraction of the cross product") {
    val candidates = MatchBlocking.candidatePairs(usernames, employees).count()
    val crossProduct = usernames.count() * employees.count()
    val fraction = candidates.toDouble / crossProduct
    info(f"candidates: $candidates of $crossProduct (${fraction * 100}%.1f%%)")
    assert(fraction < 0.5, f"blocking prunes nothing: $fraction%.2f")
  }
}
