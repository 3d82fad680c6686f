package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.schema.EmployeeNormalizer

/** Schema-normalization matrix (FIXTURES.md A4): every alias spelling from
  * the reference's canonical-alias table (main.py:94-99) must rename to its
  * canonical column, for every canonical target. */
class NormalizerMatrixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("every emp_id alias resolves") {
    EmployeeNormalizer.CanonicalAliases.find(_._1 == "emp_id").get._2.foreach { alias =>
      val df = Seq(("7", "Ada", "Lovelace"))
        .toDF(alias, "first_name", "last_name")
      val norm = EmployeeNormalizer.normalize(df)
      val row = norm.head()
      assert(row.getAs[String]("emp_id") === "7", s"alias '$alias'")
      assert(row.getAs[String]("employee_name") === "Ada Lovelace", s"alias '$alias'")
    }
  }

  test("every first_name/last_name alias pair resolves and derives employee_name") {
    val firsts = EmployeeNormalizer.CanonicalAliases.find(_._1 == "first_name").get._2
    val lasts = EmployeeNormalizer.CanonicalAliases.find(_._1 == "last_name").get._2
    firsts.zipAll(lasts, "first_name", "last_name").foreach { case (fa, la) =>
      val df = Seq(("1", "Grace", "Hopper")).toDF("id", fa, la)
      val norm = EmployeeNormalizer.normalize(df)
      val row = norm.head()
      assert(row.getAs[String]("first_name") === "Grace", s"aliases '$fa'/'$la'")
      assert(row.getAs[String]("last_name") === "Hopper", s"aliases '$fa'/'$la'")
      assert(row.getAs[String]("employee_name") === "Grace Hopper", s"aliases '$fa'/'$la'")
    }
  }

  test("every employee_name alias resolves and derives first/last by split") {
    EmployeeNormalizer.CanonicalAliases.find(_._1 == "employee_name").get._2.foreach { alias =>
      val df = Seq(("3", "Alan M Turing")).toDF("EMP NO", alias)
      val norm = EmployeeNormalizer.normalize(df)
      val row = norm.head()
      assert(row.getAs[String]("first_name") === "Alan", s"alias '$alias'")
      assert(row.getAs[String]("last_name") === "M Turing", s"alias '$alias' (split n=1 keeps remainder)")
    }
  }

  test("mixed-case headers lowercase before alias resolution") {
    val df = Seq(("5", "Katherine", "Johnson")).toDF("EMP_ID", "First_Name", "Last_Name")
    val row = EmployeeNormalizer.normalize(df).head()
    assert(row.getAs[String]("emp_id") === "5")
    assert(row.getAs[String]("employee_name") === "Katherine Johnson")
  }

  test("first matching alias wins; existing canonical column is never clobbered") {
    // both 'id' (alias) and 'emp_id' (canonical) present: canonical wins
    val df = Seq(("explicit", "999", "Ada Lovelace")).toDF("emp_id", "id", "name")
    val row = EmployeeNormalizer.normalize(df).head()
    assert(row.getAs[String]("emp_id") === "explicit")
  }

  test("null cells fill to empty strings, whitespace trims") {
    val df = Seq(("8", Some("  Edsger  "), None: Option[String]))
      .toDF("id", "fname", "lname")
    val row = EmployeeNormalizer.normalize(df).head()
    assert(row.getAs[String]("first_name") === "Edsger")
    assert(row.getAs[String]("last_name") === "")
  }
}
