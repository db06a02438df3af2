package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine-exact aggregate builders.
 *
 * Summing doubles is order-dependent, and a distributed engine sums in
 * partition order — so a double SUM can never hash-match a single-threaded
 * oracle bit-for-bit. Casting each value to a fixed-scale decimal first
 * makes the aggregation exact integer arithmetic (order-independent,
 * overflow-checked), after which one final cast to double is deterministic.
 * The same trick keeps results stable across AQE re-partitioning at scale.
 */
object Exact {
  /** Order-independent SUM: per-value decimal cast → exact sum → double. */
  def decSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Order-independent AVG over all rows of the group. */
  def decAvg(c: Column, scale: Int = 6): Column =
    decSum(c, scale) / count(lit(1))

  /** Row count as BIGINT (matches DuckDB's COUNT(*)). */
  def cnt: Column = count(lit(1))
}
