package graft

import org.apache.spark.sql.SparkSession

/**
 * The caller-owned-cache contract, in one place.
 *
 * Several operators persist an intermediate frame that the RETURNED
 * (lazy) DataFrame still reads — multi-branch frames like
 * `Dedup.goldenRecord`'s records⋈labels join, `setSimilarityJoin`'s
 * ordered-token frame, the md5 sketch twins' signature frames, or
 * `Similarity.hyperplaneLshPairs`' bucket frame. Those operators CANNOT
 * eagerly unpersist (the result has not run yet); the cache lifetime
 * belongs to the caller:
 *
 *  - run-once callers (Verify, Bench, one-shot jobs): call
 *    [[releaseAll]] after materializing each query;
 *  - interactive/repeated callers: keep the cache while re-querying,
 *    release when done.
 *
 * Operators whose persisted frame is DEAD before return (training
 * passes that end in a `localCheckpoint`ed model frame: `pcaPower`,
 * `logisticWeights`, `kmeansFit`'s feature frame) must instead
 * eager-unpersist inside the operator — `CacheHygieneSpec` audits every
 * persisting query entry for exactly that distinction: after
 * materialization, every live cache entry must be referenced by the
 * returned plan, and after [[releaseAll]] the session must be clean.
 */
object Caches {

  /**
   * Release every Dataset cache and persistent RDD owned by the
   * session. `clearCache()` drops the CacheManager entries;
   * `getPersistentRDDs` sweeps what clearCache cannot see —
   * `localCheckpoint` blocks (iteration frames in
   * connectedComponents/pcaPower/kmeansFit/logisticWeights), which
   * otherwise sit in the context until the ContextCleaner GCs them.
   * Blocking unpersist: a caller benchmarking the NEXT query must not
   * race block eviction.
   */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }
}
