package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.MatchPipeline
import graft.schema.EmployeeNormalizer

/** End-to-end match pipeline against the reference's own fixture CSVs
  * (/root/reference/employee.csv x usernames.csv — read-only data inputs). */
class MatchPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val employees = EmployeeNormalizer.normalize(
    spark.read.option("header", "true").csv("/root/reference/employee.csv"))
  lazy val usernames =
    spark.read.option("header", "true").csv("/root/reference/usernames.csv")

  test("normalizer canonicalizes the reference roster") {
    assert(employees.columns.toSeq ===
      Seq("emp_id", "first_name", "last_name", "employee_name"))
    assert(employees.count() === 154)
    val r1 = employees.filter($"emp_id" === "1").first()
    assert(r1.getAs[String]("employee_name") === "Rajesh Reddy")
  }

  test("normalizer alias + derivation branches") {
    // alias: staff_id/surname/fullname; split-derivation from full name
    val df = Seq(("9", "Ada Lovelace"), ("10", "Cher")).toDF("staff_id", "fullname")
    val norm = EmployeeNormalizer.normalize(df)
    val ada = norm.filter($"emp_id" === "9").first()
    assert(ada.getAs[String]("first_name") === "Ada")
    assert(ada.getAs[String]("last_name") === "Lovelace")
    val cher = norm.filter($"emp_id" === "10").first()
    assert(cher.getAs[String]("first_name") === "Cher")
    assert(cher.getAs[String]("last_name") === "")
    // missing emp_id -> empty canonical frame (main.py:131-133)
    val bad = EmployeeNormalizer.normalize(Seq(("Ada", "Lovelace")).toDF("first name", "last name"))
    assert(bad.count() === 0)
    assert(bad.columns.toSeq === Seq("emp_id", "first_name", "last_name", "employee_name"))
  }

  test("exact pattern username scores 100 and ranks HIGH CONFIDENCE") {
    val out = MatchPipeline.matchOutput(Seq("kul_sanjay").toDF("username"), employees)
    val rows = out.collect()
    // kul_sanjay is not one of the 8 exact patterns (that would be
    // "kulkarni_sanjay"), but Sanjay Kulkarni must surface in the top-4 via
    // fuzzy+token evidence, and some match must clear the threshold
    assert(rows.exists(_.getAs[String]("match_type") == "HIGH CONFIDENCE"))
    assert(rows.exists(_.getAs[String]("emp_name") == "Sanjay Kulkarni"), rows.mkString("\n"))
  }

  test("pattern short-circuit: synthetic f.l username") {
    val out = MatchPipeline.matchOutput(Seq("swati.patel").toDF("username"), employees)
    val rows = out.collect()
    val high = rows.filter(r => r.getAs[String]("confidence_score") == "100.00%")
    assert(high.exists(_.getAs[String]("emp_name") == "Swati Patel"))
    assert(high.forall(_.getAs[String]("match_type") == "HIGH CONFIDENCE"))
  }

  test("no-match probe emits USER NOT FOUND sentinel") {
    val out = MatchPipeline.matchOutput(Seq("testme", "zzz_qqq_999").toDF("username"), employees)
    val nf = out.filter($"match_type" === "USER NOT FOUND").collect()
    assert(nf.length === 2)
    assert(nf.forall(_.getAs[String]("emp_id") == "N/A"))
    assert(nf.forall(_.getAs[String]("confidence_score") == "0.00%"))
  }

  test("per-username groups respect top-k=4 and threshold>=50") {
    val out = MatchPipeline.matchOutput(usernames, employees)
    val counts = out.filter($"match_type" =!= "USER NOT FOUND")
      .groupBy("username").count().collect()
    assert(counts.forall(_.getAs[Long]("count") <= 4))
    // full run covers all 110 usernames (matched or sentinel)
    assert(out.select("username").distinct().count() === 110)
  }

  test("dense-rank tie semantics: equal scores share a label") {
    import graft.scoring.MatchScore
    // two employees with identical names force a tie
    val emp = Seq(("1", "Harsh", "Mehta", "Harsh Mehta"),
                  ("2", "Harsh", "Mehta", "Harsh Mehta"),
                  ("3", "Neha", "Singh", "Neha Singh"))
      .toDF("emp_id", "first_name", "last_name", "employee_name")
    val out = MatchPipeline.matchOutput(Seq("harsh.mehta").toDF("username"), emp).collect()
    val highs = out.filter(_.getAs[String]("match_type") == "HIGH CONFIDENCE")
    assert(highs.length === 2, out.mkString("\n"))
  }

  test("scores are within [0,100] across the full cross product") {
    val scored = MatchPipeline.scoredPairs(usernames, employees)
    val mm = scored.agg(min("score"), max("score")).first()
    assert(mm.getDouble(0) >= 0.0)
    assert(mm.getDouble(1) <= 100.0)
  }
}
