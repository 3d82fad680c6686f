package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

/** The SQL-facing function surface: session registry (registerAll) and the
  * SparkSessionExtensions injector (GraftExtensions). */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("every engine function is callable from plain SQL") {
    import spark.implicits._
    val row = spark.sql(
      """SELECT fuzz_ratio('rajesh123', 'rajesh')       AS r,
        |       fuzz_partial_ratio('yankees', 'new york yankees') AS pr,
        |       fuzz_token_set_ratio('swati.patel', 'swati patel') AS tsr,
        |       soundex_jf('rajesh123')                 AS sdx,
        |       metaphone('jellyfish')                  AS mp,
        |       lang_id('the quick brown fox is here and it is fast') AS lang,
        |       size(lsh_bands(minhash_sig('a b c d e', 2, 8), 4)) AS nbands,
        |       ngram_jaccard('a b c d', 'a b c d', 2)  AS jac,
        |       size(shingle_set('a b c d a b c', 2))   AS nsh,
        |       cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        |       hyperplane_bucket(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)), 4, 42L) AS bkt
        |""".stripMargin).head()
    assert(row.getAs[Int]("r") === 80)
    assert(row.getAs[Int]("pr") === 100)
    assert(row.getAs[Int]("tsr") === 100)
    assert(row.getAs[String]("sdx") === "R220")
    assert(row.getAs[String]("mp") === "JLFX")
    assert(row.getAs[String]("lang") === "en")
    assert(row.getAs[Int]("nbands") === 2)
    assert(row.getAs[Double]("jac") === 1.0)
    // shingles of "a b c d a b c" at w=2: ab bc cd da ab bc -> 4 distinct
    assert(row.getAs[Int]("nsh") === 4)
    assert(math.abs(row.getAs[Double]("cos") - 1.0) < 1e-12)
    val bkt = row.getAs[Int]("bkt")
    assert(bkt >= 0 && bkt < 16)
  }

  test("GraftExtensions injects the full function set") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // build a bare session-state function registry from the injected list via
    // a throwaway session clone: the injector API only exposes build-time
    // hooks, so assert indirectly — applying twice must not throw, and the
    // injector must register the same names the session registry knows
    new GraftExtensions().apply(ext)
    val names = Seq("fuzz_ratio", "fuzz_partial_ratio", "fuzz_token_set_ratio",
      "fuzz_token_sort_ratio", "soundex_jf", "metaphone", "lang_id", "simhash64",
      "rolling_fingerprint", "minhash_sig", "lsh_bands", "ngram_jaccard",
      "shingle_set", "cosine_sim", "hyperplane_bucket", "topk_by", "heavy_hitters")
    names.foreach { n =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)), n)
    }
  }

  test("KernelSimplification folds reflexive kernel calls under its guards") {
    import org.apache.spark.sql.functions._
    import graft.plans.KernelSimplification
    // non-nullable child (concat of non-nullables over range): ratio folds,
    // token-set does NOT (its value depends on runtime token emptiness)
    val safe = spark.range(3)
      .select(concat(lit("u"), col("id").cast("string")).as("s"))
      .select(
        graft.functions.fuzz_ratio(col("s"), col("s")).as("r"),
        graft.functions.fuzz_token_set_ratio(col("s"), col("s")).as("t"))
    val folded = KernelSimplification(safe.queryExecution.analyzed)
    val rendered = folded.expressions.map(_.sql).mkString("; ")
    assert(!rendered.contains("fuzz_ratio"), rendered)
    assert(rendered.contains("100"), rendered)
    assert(rendered.contains("fuzz_token_set_ratio"), rendered)

    // nullable child: nothing folds (NULL in -> NULL out must survive)
    import spark.implicits._
    val nullable = Seq("x").toDF("s")
      .select(graft.functions.fuzz_ratio(col("s"), col("s")).as("r"))
    val kept = KernelSimplification(nullable.queryExecution.analyzed)
    assert(kept.expressions.map(_.sql).mkString.contains("fuzz_ratio"))

    // literal token-set child with provably non-empty tokens: folds
    val lits = spark.range(1).select(
      graft.functions.fuzz_token_set_ratio(lit("a b"), lit("a b")).as("t"))
    val litFolded = KernelSimplification(lits.queryExecution.analyzed)
    assert(!litFolded.expressions.map(_.sql).mkString.contains("fuzz_token_set_ratio"))
  }

  test("README SQL-surface examples run as written against real tables") {
    // one query per function family, same shapes as README.md "The SQL
    // surface" — if an example there stops running, this fails
    val sf = SparkTestBase.Sf0001
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("documents_v")
    spark.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("embeddings_v")
    spark.read.parquet(s"$sf/orders.parquet").createOrReplaceTempView("orders_v")
    spark.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("customer_v")

    val fuzzy = spark.sql(
      """SELECT fuzz_ratio('swati.patel', 'swati patel')      AS ratio,
        |       fuzz_partial_ratio('yankees', 'new york yankees') AS pr
        |""".stripMargin).head()
    assert(fuzzy.getAs[Int]("pr") === 100)

    val phon = spark.sql(
      "SELECT soundex_jf('rajesh123') AS sdx, metaphone('jellyfish') AS mp").head()
    assert(phon.getAs[String]("sdx") === "R220" && phon.getAs[String]("mp") === "JLFX")

    val bands = spark.sql(
      """SELECT doc_id, explode(lsh_bands(minhash_sig(text, 3, 32), 4)) AS band_key
        |FROM documents_v""".stripMargin)
    assert(bands.groupBy("doc_id").count().head().getLong(1) === 8L)

    val emb = spark.sql(
      """SELECT vec_id,
        |       cosine_sim(embedding, embedding) AS cos,
        |       hyperplane_bucket(embedding, 8, 42L) AS bucket
        |FROM embeddings_v""".stripMargin).head()
    assert(math.abs(emb.getAs[Double]("cos") - 1.0) < 1e-9)

    val topk = spark.sql(
      """SELECT c_mktsegment, topk_by(o_totalprice, o_orderkey, 3) AS top3
        |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
    assert(topk.count() === 5)
    assert(topk.selectExpr("size(top3)").head().getInt(0) === 3)
  }
}
