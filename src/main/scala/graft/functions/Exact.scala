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
 *
 * Cost: the per-row double→decimal cast goes through BigDecimal and is
 * the dominant cost of these aggregates (measured ~4.6× a plain double
 * SUM on the q01 shape — the scan itself is ~0.6 s of q01's ~2.9 s).
 * That is the price of cross-engine bit-reproducibility; pipelines that
 * only need within-engine determinism-to-the-ulp can use plain double
 * sums and accept partition-order-dependent last-bit variation.
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

  private def dec(c: Column, scale: Int) = c.cast(s"decimal(18,$scale)")

  /**
   * Order-independent Pearson correlation: every moment (Σx, Σy, Σxy,
   * Σx², Σy²) is an exact decimal sum, and only the final closed-form
   * combination runs in double — so the result is bit-stable across
   * partitionings AND reproducible by any engine that writes the same
   * closed form over the same exact sums (unlike `corr`, whose streaming
   * merge formula is engine-specific).
   *
   * Caveat: the final decimal→double casts are only engine-identical
   * while each sum stays below 2^53 scaled units — beyond that the cast
   * itself rounds, and engines may round differently. Pick `scale` (and
   * input magnitudes) accordingly.
   */
  def decCorr(x: Column, y: Column, scale: Int = 4): Column = {
    val n = count(lit(1)).cast("double")
    val sx = sum(dec(x, scale)).cast("double")
    val sy = sum(dec(y, scale)).cast("double")
    val sxy = sum(dec(x, scale) * dec(y, scale)).cast("double")
    val sxx = sum(dec(x, scale) * dec(x, scale)).cast("double")
    val syy = sum(dec(y, scale) * dec(y, scale)).cast("double")
    (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
  }

  /** Order-independent population standard deviation (same construction).
   *  The radicand is clamped at 0: for a zero-variance group the exact
   *  sums cancel only up to the decimal→double casts, and the residual
   *  can land a few ulps NEGATIVE (e.g. n identical 0.1 values) — sqrt
   *  would then return NaN here and ERROR in DuckDB. `greatest(x, 0)`
   *  is bit-neutral for every non-degenerate group, so oracles mirror
   *  it verbatim. */
  def decStddevPop(x: Column, scale: Int = 4): Column = {
    val n = count(lit(1)).cast("double")
    val sx = sum(dec(x, scale)).cast("double")
    val sxx = sum(dec(x, scale) * dec(x, scale)).cast("double")
    sqrt(greatest(n * sxx - sx * sx, lit(0d))) / n
  }
}
