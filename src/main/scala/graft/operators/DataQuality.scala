package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality audit — the admission gate a training-data pipeline runs
 * before ingesting a table: completeness (null counts on key columns),
 * domain constraints (value ranges), and referential integrity (orphan
 * foreign keys), emitted as ONE summary row.
 *
 * Scale shape: all completeness/domain checks ride a single aggregate
 * scan (map-side partial aggregation, no shuffle beyond the 1-row
 * final); the referential check is one anti join keyed on the foreign
 * key — the only data-sized shuffle, and skippable when the dimension
 * side fits a broadcast.
 */
object DataQuality {

  /** Audit of the `orders` fact table against the `customer` dimension. */
  def auditOrders(orders: DataFrame, customers: DataFrame): DataFrame = {
    val checks = orders.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("null_orderdate"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("nonpositive_totalprice"))
    val orphans = orders
      .join(customers.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_orders"))
    checks.crossJoin(orphans)
  }
}
