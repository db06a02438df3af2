package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering for multi-dimensional data skipping.
 *
 * A table sorted on one column prunes scans filtered on that column and
 * nothing else; interleaving the bits of several columns into one sort
 * key keeps rows that are close in EVERY dimension close in the file
 * layout, so parquet min/max stats prune box predicates on any subset
 * of the clustered columns. This is the layout trick behind
 * Delta/Iceberg `ZORDER BY`, re-expressed as plain Spark: build the
 * key, range-partition + sort on it, write.
 */
object ZOrder {

  /**
   * Morton key: interleaves the low `bits` bits of each column
   * round-robin (column 0 owns the least-significant lane). Inputs must
   * be non-negative integers — range-normalize real columns first (rank,
   * epoch-day, bucketed value); `bits * cols.size` must fit in 63.
   *
   * Pure shift/and/or expression tree — codegen-friendly, no UDF.
   */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits * cols must fit a positive long, got $bits * ${cols.size}")
    val lanes = for {
      (c, lane) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * cols.size + lane)
    lanes.reduce(_.bitwiseOR(_))
  }

  /**
   * Rewrite `df` into a Z-ordered parquet layout: range-partition on the
   * Morton key (each output file owns a contiguous Z-range), sort within
   * partitions, drop the key, write. One range shuffle — the same cost
   * as any global sort-before-write — bought once at layout time; every
   * later box-filtered scan pays less.
   */
  def writeZOrdered(
      df: DataFrame, destDir: String, cols: Seq[String], bits: Int = 18,
      numFiles: Int = 0): Unit = {
    val keyed = df.withColumn("__gz", zorderKey(cols.map(col), bits))
    val ranged =
      if (numFiles > 0) keyed.repartitionByRange(numFiles, col("__gz"))
      else keyed.repartitionByRange(col("__gz"))
    ranged.sortWithinPartitions("__gz")
      .drop("__gz")
      .write.mode("overwrite").parquet(destDir)
  }
}
