package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  test("log2fp is exact on powers of two and floor-monotone everywhere") {
    // lattice points: log2fp(2^k) must be exactly k << 30
    (0 to 62).foreach { k =>
      assert(Dsir.log2fp(1L << k) === k.toLong << 30, s"2^$k")
    }
    // truncating recurrence: result within [true - 4 ulp_lattice, true]
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val x = 1L + (rnd.nextLong().abs % (1L << 50))
      val fp = Dsir.log2fp(x).toDouble / (1L << 30)
      val tru = math.log(x.toDouble) / math.log(2.0)
      assert(fp <= tru + 1e-9, s"x=$x fp=$fp tru=$tru (must not exceed)")
      assert(tru - fp < 1e-7, s"x=$x fp=$fp tru=$tru (too coarse)")
    }
    // monotone in x (dense sweep over a boundary-rich range)
    var prev = Long.MinValue
    (1L to 5000L).foreach { x =>
      val v = Dsir.log2fp(x)
      assert(v >= prev, s"non-monotone at $x")
      prev = v
    }
  }

  test("target-domain documents carry higher average importance weight") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val w = Dsir.importanceWeights(docs, "text", "doc_id",
      isTarget = col("lang") === "en", buckets = 4096, topK = 100)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val avg = w.groupBy(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg("log2_weight").as("m"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(avg(true) > avg(false),
      s"en avg ${avg(true)} must exceed non-en avg ${avg(false)}")
    // exactly topK selected, and the selected set is the weight top-k
    assert(w.filter("selected").count() === 100L)
    val sel = w.filter("selected").agg(min("llr_fp")).head.getLong(0)
    val unsel = w.filter("NOT selected").agg(max("llr_fp")).head.getLong(0)
    assert(sel >= unsel, "a selected weight is below an unselected one")
  }

  test("gumbel noise replays the two-level lattice log exactly") {
    // column kernel vs a direct driver-side composition of log2fp
    val ids = spark.range(0, 2000).toDF("id")
    val got = ids.select(col("id"),
      Dsir.gumbelNoiseFp(col("id"), seed = 42L).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 2000L).foreach { id =>
      val h = math.max(graft.functions.TextAlgos.mix64(id ^ 42L) >>> 1, 1L)
      val negLog2U = (63L << 30) - Dsir.log2fp(h)
      val want = (30L << 30) - Dsir.log2fp(negLog2U)
      assert(got(id) === want, s"id=$id")
    }
  }

  test("gumbel sampling favors high-weight documents across seeds") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    // selection frequency over 10 seeds must put substantially more mass
    // on the weight-top-100 set than a uniform draw would (100/500 = 20%)
    val w = Dsir.importanceWeights(docs, "text", "doc_id",
      isTarget = col("lang") === "en", buckets = 4096, topK = 100)
    val top100 = w.filter("selected").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val hits = (1L to 10L).map { seed =>
      val s = Dsir.gumbelSample(docs, "text", "doc_id",
        isTarget = col("lang") === "en", buckets = 4096, topK = 100,
        seed = seed)
      val sampled = s.filter("sampled").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(sampled.size === 100, s"seed=$seed")
      (sampled intersect top100).size
    }
    val meanOverlap = hits.sum.toDouble / hits.length
    assert(meanOverlap > 35.0,
      s"mean overlap with weight-top-100 is $meanOverlap — sampling is not weight-driven")
    // and it IS a perturbation, not a copy: some seeds must disagree
    assert(hits.exists(_ < 100), s"gumbel sample identical to top-k: $hits")
  }

  test("weights are partitioning-invariant (exact integer lattice)") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.importanceWeights(df, "text", "doc_id",
        isTarget = col("lang") === "en", buckets = 4096, topK = 100)
        .select("doc_id", "llr_fp", "selected")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    assert(run(docs) === run(docs.repartition(13, col("doc_id"))))
  }

  test("domain KL matches an exact driver replay over the full bucket domain") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val got = Dsir.domainDivergence(docs, "text", col("source"), buckets = 4096)
      .select("stratum", "n_feats", "kl_fp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

    // independent replay: collect the raw (stratum, bucket) stream once,
    // then fold the SAME integer lattice arithmetic on the driver
    val feats = docs.select(col("source"),
        explode(Dsir.featureBuckets(col("text"), 4096)).as("b"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val csb = feats.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val cb = feats.groupBy(_._2).map { case (b, v) => (b, v.length.toLong) }
    val ns = feats.groupBy(_._1).map { case (s, v) => (s, v.length.toLong) }
    val n = feats.length.toLong
    val want = ns.toSeq.sortBy(_._1).map { case (s, nS) =>
      val kl = (0 until 4096).map { b =>
        val cSb = csb.getOrElse((s, b), 0L)
        val cB = cb.getOrElse(b, 0L)
        (cSb + 1) * ((Dsir.log2fp(cSb + 1) - Dsir.log2fp(nS + 4096))
          - (Dsir.log2fp(cB + 1) - Dsir.log2fp(n + 4096)))
      }.sum
      (s, nS, kl)
    }
    assert(got === want)
    // Gibbs: true KL >= 0; the lattice truncation can shave at most a few
    // ulps per term, so kl_bits must not go meaningfully negative — and
    // real sources must separate from the mixture
    val bits = Dsir.domainDivergence(docs, "text", col("source"), 4096)
      .select("kl_bits").collect().map(_.getDouble(0))
    assert(bits.forall(_ > -1e-6), s"KL went negative: ${bits.min}")
    assert(bits.exists(_ > 1e-3), "no source separates from the mixture at all")
  }

  test("domain KL is partitioning-invariant (exact integer lattice)") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dsir.domainDivergence(df, "text", col("source"), 4096)
        .select("stratum", "kl_fp").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run(docs) === run(docs.repartition(17, col("doc_id"))))
  }
}
