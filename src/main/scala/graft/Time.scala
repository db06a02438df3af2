package graft


/**
 * Ad-hoc per-query timing: `runMain graft.Time <query> [reps]` runs one
 * named query `reps` times (default 3) against `SPARK_GRAFT_SF_DIR`
 * (default sf0.1), materializing through the noop sink exactly like
 * [[Bench]], and prints each reading. The iteration loop for perf work —
 * Bench's 90-query sweep is too blunt to tune a single operator with.
 */
object Time {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: runMain graft.Time <query> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus, Some(sfDir))
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Caches.releaseAll(spark)
      println(f"[time] $name rep $i: $sec%.3f s")
    }
    spark.stop()
  }
}
