package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimilaritySearch

/** ss_recall_trained's semantic contract (r18 verdict #6).
  *
  * Where the trained-beats-prefix claim is PINNED matters: the driver
  * corpus is ISOTROPIC (measured r19: mean intra-label cosine 0.001 ==
  * mean inter-label 0.001 at sf0.1) — on a structureless sphere NO
  * trained quantizer can beat a random one at equal nprobe except by
  * sampling noise, so a strict >= there would pin a coin flip. The
  * strict assertion lives on a CLUSTERED fixture with CORRELATED
  * anchors (all 16 cluster centers inside one spherical cap, so cell
  * routing is genuinely contested), where k-means recovers the true
  * cluster means and training earns its keep — measured r19: trained
  * 1.000 vs prefix 0.960 at nprobe=1; the isotropic driver corpus pins a
  * NOISE BAND (trained within 0.15 recall of prefix) plus the output
  * shape the pinned-output driver oracle depends on.
  */
class SsRecallTrainedSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def rows(dir: String): Map[String, (Long, Long, Double)] =
    SparkEntry.queries("ss_recall_trained")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("clustered corpus: trained k-means recall >= prefix at equal nprobe") {
    val corpus = spark.read.parquet(s"${SparkTestBase.Sf001}/embeddings.parquet")
    // CORRELATED anchors — every cluster center within ~45 degrees of a
    // shared direction — so cells crowd one cap of the sphere and routing
    // is genuinely contested (well-separated anchors saturate both
    // quantizers at recall 1.0, measured r19)
    val raw = corpus.orderBy("vec_id").limit(17).collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).toArray)
    val hub = raw.head
    val anchors = raw.tail.map { a =>
      val m = Array.tabulate(a.length)(i => hub(i) + 0.45f * a(i))
      val n = math.sqrt(m.map(x => x.toDouble * x).sum).toFloat
      m.map(_ / n)
    }
    val bcast = spark.sparkContext.broadcast(anchors)
    val clustered = corpus.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val a = bcast.value((id % 16).toInt)
        (id, Array.tabulate(a.length)(i => a(i) + 0.35f * v(i)))
      }.toDF("vec_id", "embedding").cache()
    try {
      val q = clustered.filter(pmod(col("vec_id"), lit(100)) === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val exact = pairs(SimilaritySearch.bruteForceKnn(clustered, q, 5))
      def recall(p: Set[(Long, Long)]) = (exact & p).size.toDouble / exact.size
      // nprobe=1 grades pure cell-assignment quality: every true
      // neighbor shares its query's cluster, so recall == the rate at
      // which the quantizer routes a query to its own cluster's cell
      val prefix = recall(pairs(
        SimilaritySearch.ivfSq8Knn(clustered, q, 5, nprobe = 1)))
      val cents = SimilaritySearch.kmeansCentroids(clustered, 16)
      val trained = recall(pairs(
        SimilaritySearch.ivfSq8Knn(clustered, q, 5, nprobe = 1,
          centroids = Some(cents))))
      info(f"clustered recall@5 at nprobe=1: trained $trained%.3f vs prefix $prefix%.3f")
      assert(trained >= prefix,
        f"on a corpus WITH structure the trained quantizer ($trained%.3f) " +
          f"must not lose to the corpus prefix ($prefix%.3f)")
      assert(trained >= 0.98,
        f"trained quantizer must route queries to their own cluster " +
          f"(measured floor 1.000, got $trained%.3f)")
    } finally clustered.unpersist()
  }

  test("isotropic driver corpus: trained within the noise band of prefix (sf0.1)") {
    val m = rows(SparkTestBase.Sf01)
    assert(m.keySet === Set("prefix", "trained_kmeans"))
    val (nqP, hitP, recP) = m("prefix")
    val (nqT, hitT, recT) = m("trained_kmeans")
    assert(nqT === nqP, "both legs grade the same query slice")
    assert(hitP <= 5L * nqP && hitT <= 5L * nqT)
    assert(math.abs(recT - recP) <= 0.15,
      s"isotropic corpus: quantizer recall gap ($recT vs $recP) beyond noise")
  }

  test("trained leg is deterministic across serve runs (sf0.001)") {
    val a = rows(SparkTestBase.Sf0001)("trained_kmeans")
    val b = rows(SparkTestBase.Sf0001)("trained_kmeans")
    assert(a === b)
  }
}

