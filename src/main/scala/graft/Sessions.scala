package graft

import org.apache.spark.sql.SparkSession

/**
 * Shared local-session builder for the driver-contract mains
 * (Verify / Bench / Time / Explain): one place for the master, shuffle
 * parallelism, AQE, UTC, UI, and catalog-required confs — so a
 * single-query timing (Time) always measures exactly the session Bench
 * benchmarks, and a new required conf lands everywhere at once.
 */
object Sessions {
  def local(cpus: String): SparkSession =
    graft.sources.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE picks the real post-shuffle parallelism between `cpus` and
      // this ceiling: starting 8x wider keeps per-task state bounded as
      // the input grows (the sf10 step measured 32-partition sorts of
      // pair-heavy stages spilling into 20-30x wall ratios and two
      // execution-memory aborts), while small stages coalesce back to
      // ~`cpus`-sized partitions, so sf0.01-sf0.1 plans are unchanged
      // in effect. A real cluster sizes this by executor count; the
      // ratio, not the constant, is what scales.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        ((cpus.toIntOption.getOrElse(32)) * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
