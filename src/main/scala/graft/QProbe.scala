package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Dedup

object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val d = sources.Tables(spark, dir).documents
    val shingles = TextFns.wordShingles(TextFns.tokens(col("text")), 3)
    time("warm read")(d.count())
    val sets = d.select(col("doc_id"), shingles.as("sh"))
    time("shingle compute only")(sets.write.format("noop").mode("overwrite").save())
    val sig = d.select(col("doc_id"), Dedup.minhashSignature(spark, shingles, 120).as("s"))
    time("signature only")(sig.write.format("noop").mode("overwrite").save())
    val cands = Dedup.minhashCandidates(d, "doc_id", shingles)
    time("candidates")(cands.write.format("noop").mode("overwrite").save())
    val full = Dedup.minhashNearDups(d, "doc_id", shingles, threshold = 0.8, cacheSets = true)
    time("full cached")(full.write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    val full2 = Dedup.minhashNearDups(d, "doc_id", shingles, threshold = 0.8, cacheSets = false)
    time("full uncached")(full2.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
