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
   * Rolling `localCheckpoint` for iterative operators (pointer-jumping
   * CC, power/Lloyd/GD loops). Each iteration checkpoints one
   * generation of frames; once the NEXT generation is eagerly
   * materialized, the previous generation's blocks are dead — but
   * nothing ever released them, so a 5-iteration loop held 5
   * generations of state (audited by `CacheHygieneSpec`; at corpus
   * scale that is N iterations of cluster memory instead of 1).
   *
   * Protocol: `roll(df)` eagerly checkpoints `df` into the current
   * generation (a generation may hold several frames — pcaPower
   * checkpoints a vector AND its norm per iteration); `advance()`
   * seals the generation and releases the blocks of the one BEFORE it,
   * which the just-materialized generation no longer reads. The final
   * generation is never released here — the returned plan still scans
   * it; the caller sweeps it via [[releaseAll]] per the caller-owned
   * contract above.
   */
  final class CheckpointRoller(spark: SparkSession) {
    private var prev: Set[Int] = Set.empty
    private var cur: Set[Int] = Set.empty

    /** Eagerly localCheckpoint `df`, tracking its blocks in the current
     *  generation. Attribution is by registration diff, NARROWED to
     *  checkpointed RDDs: the eager materialization may be the
     *  first execution of some caller-owned Dataset cache (kmeans'
     *  feature frame, a signature frame), whose buffer RDD registers at
     *  that moment — attributing it to this generation would release a
     *  cache the operator still reads. Checkpoint blocks are the only
     *  thing a roller owns. */
    def roll(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val next = df.localCheckpoint()
      cur = cur ++ sc.getPersistentRDDs.collect {
        case (id, r) if !before(id) && r.isCheckpointed => id
      }
      next
    }

    /** Seal the current generation; release the superseded one. */
    def advance(): Unit = {
      val reg = spark.sparkContext.getPersistentRDDs
      prev.foreach(id => reg.get(id).foreach(_.unpersist(true)))
      prev = cur
      cur = Set.empty
    }
  }

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
