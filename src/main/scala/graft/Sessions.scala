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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
