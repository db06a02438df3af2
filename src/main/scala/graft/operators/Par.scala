package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, LeafNode, Union}

/**
 * Deliberate parallelism for COMPUTE-heavy stages over BYTE-light
 * frames.
 *
 * Spark sizes stages by bytes twice: scans split files by
 * `maxPartitionBytes` (and a single-row-group parquet file cannot split
 * at all — the bench tables are exactly that), and AQE coalesces
 * post-shuffle partitions by `advisoryPartitionSizeInBytes`. Both are
 * blind to per-row COMPUTE, so a stage that explodes each row into
 * hundreds of md5/levenshtein/decimal-string terms lands on 1-3 tasks
 * while the other cores idle — profiled at sf0.1 as the dominant cost
 * of the minhash, fuzzy-linkage, shingle-stats, centroid and
 * gradient-descent families (single-task jobs of 1-8 s inside 2-13 s
 * queries).
 *
 * [[spread]] inserts one explicit hash repartition — user-specified
 * partitioning is exempt from AQE coalescing — keyed by a DETERMINISTIC
 * column (never round-robin where a retry could reassign rows,
 * SPARK-38388), sized by the leaf-stats row estimate: `rowsPerPart`
 * input rows per task calibrated to the operator's per-row cost,
 * clamped to the [cores, 16× cores] envelope
 * ([[graft.Sessions.initialPartitions]]'s bound). The shuffle it adds
 * moves only the projected input rows once — orders of magnitude below
 * the work it parallelizes; at scale the estimate grows the width up
 * to the cap instead of pinning a local-mode constant.
 */
object Par {

  /** Leaf-anchored row estimate (the RangeRank gate recipe): exact
   *  rowCount when the plan carries one, else the LARGEST leaf through
   *  joins and the SUM through unions — a join's own sizeInBytes
   *  multiplies its children, so leaves are the only honest size. */
  def leafRows(df: DataFrame): BigInt = {
    def rec(p: LogicalPlan): BigInt = p match {
      case l: LeafNode => l.stats.rowCount.getOrElse {
        val w = math.max(1, l.schema.map(_.dataType.defaultSize).sum)
        l.stats.sizeInBytes / w
      }
      case u: Union => u.children.map(rec).sum
      case _ if p.children.isEmpty => BigInt(0)
      case _ => p.children.map(rec).max
    }
    val plan = df.queryExecution.optimizedPlan
    plan.stats.rowCount.getOrElse(rec(plan))
  }

  /** Partition count for a compute-heavy stage over `df`: one task per
   *  `rowsPerPart` estimated input rows, clamped to [cores, 16×cores]. */
  def widthFor(df: DataFrame, rowsPerPart: Long): Int = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    (BigInt(cores) max (leafRows(df) / rowsPerPart) min BigInt(cores * 16L)).toInt
  }

  /** Hash-repartition `df` on `key` to [[widthFor]] partitions so the
   *  downstream compute-heavy projection/aggregation parallelizes —
   *  UNLESS the frame is already at least that wide (a multi-file scan
   *  at scale needs no help, and the skip spares its shuffle).
   *  Result-neutral by construction: placement only — callers' sums
   *  are order-free decimals, mins/counts, or keyed aggregations. */
  def spread(df: DataFrame, key: Column, rowsPerPart: Long): DataFrame = {
    val want = widthFor(df, rowsPerPart)
    if (df.rdd.getNumPartitions >= want) df
    else df.repartition(want, key)
  }
}
