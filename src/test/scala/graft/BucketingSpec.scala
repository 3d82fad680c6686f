package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Bucketed co-located joins: pre-shuffling at write time must remove the
  * runtime exchange entirely (the amortization a repeatedly-joined 100 TB
  * fact table needs). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("join of two same-bucketed tables plans with no shuffle exchange") {
    val orders = spark.read.parquet(s"${SparkTestBase.Sf0001}/orders.parquet")
    val customer = spark.read.parquet(s"${SparkTestBase.Sf0001}/customer.parquet")
    Bucketing.writeBucketed(orders, "orders_bkt", "o_custkey", 8, Seq("o_custkey"))
    Bucketing.writeBucketed(customer, "customer_bkt", "c_custkey", 8, Seq("c_custkey"))
    // disable broadcast so the planner must choose between shuffle and buckets
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "orders_bkt", "customer_bkt",
        "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // result parity with the plain join
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("aggregation on the bucket key needs no exchange either") {
    val orders = spark.read.parquet(s"${SparkTestBase.Sf0001}/orders.parquet")
    Bucketing.writeBucketed(orders, "orders_bkt2", "o_custkey", 8)
    try {
      val agg = spark.table("orders_bkt2").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation must not shuffle:\n$plan")
      assert(agg.count() === orders.select("o_custkey").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt2")
    }
  }
}
