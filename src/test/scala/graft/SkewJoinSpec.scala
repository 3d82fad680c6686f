package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted-join semantics: identical results to the plain equi-join, with the
  * hot key's rows spread across salt buckets. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // 10k rows of hot key 0 + a uniform tail, joined to a small dim
  private lazy val big = spark.range(10000).select(lit(0L).as("k"), col("id").as("v"))
    .unionAll(spark.range(1000).select((col("id") % 100 + 1).as("k"), col("id").as("v")))
  private lazy val dim = spark.range(101).select(col("id").as("dk"),
    concat(lit("dim_"), col("id")).as("label"))

  test("inner salted join equals plain join") {
    val plain = big.join(dim, big("k") === dim("dk")).select("k", "v", "label")
      .as[(Long, Long, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(big, dim, "k", "dk", buckets = 8)
      .select("k", "v", "label").as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.size === 11000)
  }

  test("left salted join preserves unmatched big rows") {
    val bigger = big.unionAll(Seq((999L, -1L)).toDF("k", "v")) // no dim match
    val plain = bigger.join(dim, bigger("k") === dim("dk"), "left")
      .select(col("k"), col("v"), coalesce(col("label"), lit("NULL")))
      .as[(Long, Long, String)].collect().toSet
    val salted = SkewJoin.saltedJoin(bigger, dim, "k", "dk", buckets = 8, joinType = "left")
      .select(col("k"), col("v"), coalesce(col("label"), lit("NULL")))
      .as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.exists(_._3 == "NULL"))
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val direct = big.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = SkewJoin.saltedSum(big, "k", "v", buckets = 8)
      .select(col("k"), col("sum_v"), col("n_rows"))
      .as[(Long, Long, Long)].collect().toSet
    assert(salted === direct)
  }

  test("salt is deterministic: identical output rows under input repartition") {
    // row-content salt (pmod(xxhash64(row), buckets)) is invariant to the
    // physical layout: repartitioning the big side must reproduce the exact
    // multiset of (k, v, label, __salt-era) output rows. The old
    // partition-id+monotonic-id salt changed per layout (and per task
    // retry); this pins the fix.
    def run(b: org.apache.spark.sql.DataFrame) =
      SkewJoin.saltedJoin(b, dim, "k", "dk", buckets = 8)
        .select("k", "v", "label").as[(Long, Long, String)].collect().sorted.toSeq
    val once = run(big)
    assert(run(big.repartition(3)) === once)
    assert(run(big.repartition(17, col("v"))) === once)
    // and the salt itself spreads the hot key over >1 bucket (skew relief)
    val saltSpread = big.withColumn("__salt",
        pmod(xxhash64(col("k"), col("v")), lit(8L)).cast("int"))
      .filter(col("k") === 0L).select("__salt").distinct().count()
    assert(saltSpread > 1, "hot key must spread across salt buckets")
  }

  test("hot-key report surfaces the skewed key") {
    val hot = SkewJoin.hotKeys(big, "k").select("k").as[Long].collect()
    assert(hot.toSeq === Seq(0L))
  }
}
