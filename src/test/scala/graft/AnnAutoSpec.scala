package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimilaritySearch

/** Recall-targeted nprobe auto-select (the nm_match_topk_auto pattern for
  * ANN): the decision statistic is measured on a held-out tuning slice,
  * and BOTH branches of the choice are pinned — the narrowest-meets-target
  * pick on clustered data (where coarse cells genuinely capture
  * neighborhoods) and the documented last-candidate fallback on the
  * adversarial random-vector fixture (where no width reaches the target
  * and the grade says so). */
class AnnAutoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet

  test("fallback branch: no candidate reaches the target on the adversarial fixture; auto serves the last candidate") {
    val emb = spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
    val tuning = emb.filter(pmod(col("vec_id"), lit(100)) === 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val queries = emb.filter(pmod(col("vec_id"), lit(100)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    val (np, grades) = SimilaritySearch.chooseNprobe(emb, tuning, 5)
    info(s"adversarial grades: $grades -> nprobe $np")
    // random vectors are the worst case for a coarse quantizer: recall
    // grows with nprobe but stays under the 0.9 target at every width
    assert(grades.map(_._2) === grades.map(_._2).sorted,
      "recall must not decrease as the probe widens")
    assert(grades.forall(_._2 < SimilaritySearch.AutoTargetRecall),
      s"fixture unexpectedly reached the target: $grades")
    assert(np === SimilaritySearch.AutoNprobeCandidates.last,
      "when no candidate meets the target the LAST is the documented fallback")

    // the served frame is exactly the fixed-nprobe engine at the choice
    val auto = pairs(SimilaritySearch.ivfSq8KnnAuto(emb, queries, tuning, 5))
    val fixed = pairs(SimilaritySearch.ivfSq8Knn(emb, queries, 5, nprobe = np))
    assert(auto.nonEmpty && auto === fixed,
      "auto must serve the chosen nprobe's exact results")
  }

  test("narrow branch: clustered data meets the target at the narrowest width") {
    // the PqSpec clustered fixture: 16 anchors + 0.5x noise — cells ARE
    // the clusters, the production-embedding regime
    val corpus = spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
    val anchors = corpus.orderBy("vec_id").limit(16).collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    val bcast = spark.sparkContext.broadcast(anchors)
    val clustered = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val a = bcast.value((id % 16).toInt)
        (id, Array.tabulate(a.length)(i => a(i) + 0.5f * v(i)))
      }.toDF("vec_id", "embedding").cache()
    try {
      val tuning = clustered.filter(pmod(col("vec_id"), lit(100)) === 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val (np, grades) = SimilaritySearch.chooseNprobe(clustered, tuning, 5)
      info(s"clustered grades: $grades -> nprobe $np")
      assert(grades.head._2 >= SimilaritySearch.AutoTargetRecall,
        s"clustered fixture should meet the target at the narrowest width: $grades")
      assert(np === SimilaritySearch.AutoNprobeCandidates.head,
        "the first candidate meeting the target must win")
    } finally clustered.unpersist()
  }

  test("candidate ladder must be ascending") {
    val emb = spark.read.parquet(s"${SparkTestBase.Sf0001}/embeddings.parquet")
    val tuning = emb.filter(pmod(col("vec_id"), lit(100)) === 50)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    intercept[IllegalArgumentException] {
      SimilaritySearch.chooseNprobe(emb, tuning, 5, candidates = Seq(8, 2))
    }
  }
}
