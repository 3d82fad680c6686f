package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Schema inference + alias normalization for employee rosters — the engine's
 * "analyzer" for dynamic input schemas. Re-derives the semantics of the
 * reference's `fetch_employees` (/root/reference/main.py:93-133):
 *
 *  1. lowercase all headers;
 *  2. rename via a canonical-alias table (first matching alias wins);
 *  3. derive missing columns:
 *     - no `employee_name` but first/last present -> concat;
 *     - `employee_name` but neither first nor last -> split on first run of
 *       whitespace (token 1 -> first_name, remainder -> last_name);
 *  4. `fillna('')`, cast to string, trim everywhere;
 *  5. project to the canonical 4 columns;
 *  6. any unresolvable schema (e.g. missing emp_id) -> EMPTY canonical frame
 *     (the reference catches and returns an empty typed DataFrame,
 *     main.py:131-133).
 *
 * All schema work happens driver-side on `df.columns`; the data path is a
 * single `select` of Column expressions, so Catalyst sees one narrow
 * projection (column-pruned at the scan at any scale).
 *
 * Documented divergence from the reference: an alias is not renamed onto a
 * canonical name that is already present (pandas would produce a duplicate
 * column and fail downstream in a shape-dependent way).
 */
object EmployeeNormalizer {

  /** Canonical-alias table, verbatim from main.py:94-99. */
  val CanonicalAliases: Seq[(String, Seq[String])] = Seq(
    "emp_id" -> Seq("employee_id", "employee id", "id_employee", "staff_id",
      "emp id", "empid", "id", "employee no", "emp no"),
    "first_name" -> Seq("first name", "fname", "given_name", "first", "f_name",
      "name (first)", "namefirst"),
    "last_name" -> Seq("last name", "lname", "surname", "family_name", "l_name",
      "name (last)", "namelast"),
    "employee_name" -> Seq("full name", "fullname", "emp_name", "name of employee", "name")
  )

  val CanonicalSchema: StructType = StructType(Seq(
    StructField("emp_id", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("employee_name", StringType)))

  private def cleaned(name: String) = trim(coalesce(col(name).cast(StringType), lit("")))

  /** Normalize an arbitrarily-headed roster to the canonical 4-column shape.
    * Returns an empty canonical frame when the schema cannot be resolved. */
  def normalize(raw: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    // 1. lowercase headers
    val lowered = raw.toDF(raw.columns.map(_.toLowerCase).toIndexedSeq: _*)
    // 2. first-matching-alias rename
    var cols = lowered.columns.toSeq
    val renames = CanonicalAliases.flatMap { case (canonical, aliases) =>
      if (cols.contains(canonical)) None
      else aliases.find(cols.contains).map { alias =>
        cols = cols.map(c => if (c == alias) canonical else c)
        alias -> canonical
      }
    }
    val renamed = renames.foldLeft(lowered) { case (df, (a, c)) => df.withColumnRenamed(a, c) }

    val has = renamed.columns.toSet
    // 3. derivations (mirrors the branch structure of main.py:111-122)
    val derived =
      if (!has("employee_name") && (has("first_name") || has("last_name"))) {
        // missing side of the pair -> unresolvable (reference KeyErrors at
        // main.py:112/113 when one of first/last is absent)
        if (!has("first_name") || !has("last_name")) return empty(spark)
        renamed.withColumn("employee_name",
          concat_ws(" ", cleaned("first_name"), cleaned("last_name")))
      } else if (has("employee_name") && !has("first_name") && !has("last_name")) {
        val parts = split(trim(col("employee_name").cast(StringType)), "\\s+", 2)
        renamed
          .withColumn("first_name", trim(coalesce(try_element_at(parts, lit(1)), lit(""))))
          .withColumn("last_name", coalesce(try_element_at(parts, lit(2)), lit("")))
      } else if (has("employee_name") && (!has("first_name") || !has("last_name"))) {
        // employee_name plus exactly one of first/last: reference falls
        // through to main.py:125-127 and KeyErrors -> empty frame
        return empty(spark)
      } else renamed

    if (!derived.columns.contains("emp_id") ||
        !derived.columns.contains("employee_name")) return empty(spark)

    // 4+5. fill/cast/trim and project
    derived.select(
      cleaned("emp_id").as("emp_id"),
      cleaned("first_name").as("first_name"),
      cleaned("last_name").as("last_name"),
      cleaned("employee_name").as("employee_name"))
  }

  private def empty(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], CanonicalSchema)
}
