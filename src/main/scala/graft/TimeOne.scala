package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), Some(sfDir))
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { q =>
      operators.Dedup.lastCcRounds = -1
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $q ${(System.nanoTime()-t0)/1e9}%.2f s")
      if (operators.Dedup.lastCcRounds >= 0)
        println(s"[time] $q cc rounds=${operators.Dedup.lastCcRounds} " +
          s"edges0=${operators.Dedup.lastCcInitialEdges} " +
          s"contracted=${operators.Dedup.lastCcEdgeCounts.mkString(",")} " +
          s"frozen=${operators.Dedup.lastCcFrozenCounts.mkString(",")} " +
          s"resolveRounds=${operators.Dedup.lastCcResolveRounds}")
      Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
