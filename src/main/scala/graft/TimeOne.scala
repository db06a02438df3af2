package graft
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), Some(sfDir))
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { q =>
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $q ${(System.nanoTime()-t0)/1e9}%.2f s")
      Caches.releaseAll(spark)
    }
    spark.stop()
  }
}
