package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bloom, bloom_agg, bloom_might_contain}
import graft.operators.TextAnalysis

class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  test("kernel: no false negatives ever; false positives within the sizing bound") {
    val numBits = 1 << 16
    val mask = numBits - 1
    val k = 5
    val words = new Array[Long](numBits >>> 6)
    val rnd = new scala.util.Random(11)
    val members = Array.fill(1000)(rnd.nextLong())
    members.foreach(Bloom.add(words, mask, k, _))
    // soundness: every inserted hash answers true (this is what licenses
    // the prefilter in front of the exact confirm join)
    members.foreach(h => assert(Bloom.mightContain(words, mask, k, h)))
    // 65536 bits / 1000 elements ≈ 65 bits/element at k=5 → fpp well
    // under 1%; allow 10x slack so the pin is load-bearing, not brittle
    val memberSet = members.toSet
    val probes = Iterator.continually(rnd.nextLong()).filterNot(memberSet).take(20000)
    val fps = probes.count(Bloom.mightContain(words, mask, k, _))
    assert(fps < 200, s"false-positive rate too high: $fps / 20000")
  }

  test("bloom_agg partials merge exactly: 8-partition build == 1-partition build") {
    import spark.implicits._
    val hashes = (1L to 5000L).map(i => i * 0x9e3779b97f4a7c15L)
    def build(parts: Int): Array[Byte] = hashes.toDF("h").repartition(parts)
      .agg(bloom_agg(col("h"), lit(1 << 14), lit(5)))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(1), build(8)),
      "bit-OR merge must make the sketch partitioning-invariant")
    // and the aggregated sketch answers membership for every input
    val (nb, nh, words) = Bloom.deserialize(build(8))
    hashes.foreach(h => assert(Bloom.mightContain(words, nb - 1, nh, h)))
  }

  test("contaminationBloom is row-identical to the exact pass on real documents") {
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val train = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val probe = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val exact = TextAnalysis.contamination(train, probe, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect().toSeq
    val bloomed = TextAnalysis.contaminationBloom(train, probe, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect().toSeq
    assert(exact.nonEmpty, "fixture must actually contain contamination")
    assert(bloomed === exact)
  }

  test("prefilter prunes: disjoint-vocabulary grams never reach the confirm join") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta"),          // no gram shared
      (2L, "the quick brown fox jumps"),       // shares "the quick brown", "quick brown fox"
      (3L, "epsilon zeta eta theta iota")      // no gram shared
    ).toDF("doc_id", "text")
    val probe = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationBloom(train, probe, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(2L -> 2L))
    // the sketch itself rejects every disjoint-vocab gram (no-false-negative
    // dual: definite negatives are definitely pruned at the scan)
    val sketch = probe
      .select(explode(expr(
        """transform(sequence(1, size(split(text, ' ')) - 2),
             i -> array_join(slice(split(text, ' '), i, 3), ' '))""")).as("gram"))
      .agg(bloom_agg(xxhash64(col("gram")), lit(1 << 20), lit(5)))
      .head().getAs[Array[Byte]](0)
    val (nb, nh, words) = Bloom.deserialize(sketch)
    Seq("alpha beta gamma", "epsilon zeta eta", "zeta eta theta").foreach { g =>
      val h = spark.range(1).select(xxhash64(lit(g))).head().getLong(0)
      assert(!Bloom.mightContain(words, nb - 1, nh, h), s"'$g' must be pruned")
    }
  }

  test("empty probe set: zero-bit sketch, empty result, no crash") {
    import spark.implicits._
    val train = Seq((1L, "some training text here")).toDF("doc_id", "text")
    val probe = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.contaminationBloom(train, probe, "text", "doc_id").count() === 0L)
  }

  test("bloom_might_contain survives codegen and eval paths identically") {
    import spark.implicits._
    val words = new Array[Long](1 << 8)
    val mask = (1 << 14) - 1
    (1L to 100L).foreach(h => Bloom.add(words, mask, 3, h * 7919L))
    val sketch = Bloom.serialize(1 << 14, 3, words)
    val df = (1L to 200L).map(_ * 7919L).toDF("h")
      .withColumn("hit", bloom_might_contain(col("h"), sketch))
    val hits = df.where(col("hit")).count()
    assert(hits >= 100L, "all members must hit (plus possible false positives)")
    // interpreted path agrees with the codegen'd one
    val expr = graft.functions.BloomMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(42L * 7919L), sketch)
    assert(expr.eval(null) === true)
  }
}
