package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/**
 * Similarity search over embedding columns (SURVEY §2.2 #32-34).
 *
 * Baseline: brute-force cosine top-k — the query set is broadcast, the
 * corpus streams through the codegen'd [[graft.plans.CosineSimilarity]]
 * expression, and per-query top-k is a single windowed rank. Scale path:
 * random-hyperplane LSH buckets the corpus so each probe touches
 * ~corpus/2^bits vectors instead of all of them.
 */
object Similarity {

  /** Cosine via the native codegen expression (registers it on first use). */
  def cosine(spark: SparkSession, a: Column, b: Column): Column =
    graft.functions.Vectors.cosine(spark, a, b)

  /**
   * Exact top-k neighbors for each query vector. `queries` must be small
   * (it is broadcast); the corpus side never shuffles except for the
   * per-query rank, which AQE splits if a query's candidate set skews.
   */
  def bruteForceTopK(
      spark: SparkSession,
      corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(vec).as("__qvec"))
    val sim = cosine(spark, col(vec), col("__qvec"))
    val w = Window.partitionBy("query_id").orderBy(col("__gsim").desc, col(id).asc)
    corpus
      .join(broadcast(q), col(id) =!= col("query_id"))
      .withColumn("__gsim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(id).as("neighbor_id"))
  }

  /**
   * Random-hyperplane signature: bit j = sign(v · h_j) where h_j is a
   * Rademacher (±1) vector derived deterministically from xxhash64(j, i).
   * Computed per-row with higher-order expressions — no stored model, no
   * shuffle; the same expression reproduces the same planes on any
   * cluster.
   */
  def hyperplaneBucket(vec: Column, bits: Int, seed: Int = 42): Column =
    (0 until bits).map { j =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => when(shiftright(xxhash64(lit(seed), lit(j), i), 7)
            .bitwiseAND(lit(1L)) === 1L, x).otherwise(-x)),
        lit(0.0d), (acc, x) => acc + x)
      when(dot > 0.0d, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /**
   * Approximate top-k: queries and corpus are bucketed by hyperplane
   * signature; ranking happens only within the query's bucket. With b
   * bits the probe cost is ~|corpus| / 2^b. Recall loss is the ANN
   * trade-off — callers pick bits per corpus size.
   */
  def lshTopK(
      spark: SparkSession,
      corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int, bits: Int = 8): DataFrame = {
    val bucketed = corpus.withColumn("__gbucket", hyperplaneBucket(col(vec), bits))
    val q = queries
      .select(col(id).as("query_id"), col(vec).as("__qvec"))
      .withColumn("__qbucket", hyperplaneBucket(col("__qvec"), bits))
    val w = Window.partitionBy("query_id").orderBy(col("__gsim").desc, col(id).asc)
    bucketed
      .join(broadcast(q), col("__gbucket") === col("__qbucket") && col(id) =!= col("query_id"))
      .withColumn("__gsim", cosine(spark, col(vec), col("__qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(id).as("neighbor_id"))
  }

  /**
   * K-means centroids (Lloyd's) over an embedding column, entirely in
   * DataFrame ops: initialization takes the `k` lowest-id vectors (no
   * RNG), each iteration assigns rows to the nearest centroid (argmax
   * cosine, shuffle-free) and recomputes per-cluster means via
   * posexplode + per-dimension avg (map-side partials), so iterations
   * scale to any corpus size. A cluster that captures no rows keeps its
   * previous centroid rather than silently vanishing, so `k` cells
   * always survive. Initialization and tie-breaks are deterministic;
   * the mean itself merges double partials in shuffle order, so
   * centroids can differ in the last ulp between runs — searches that
   * need run-to-run bit-stability should persist the index (centroids +
   * assignments) once and reuse it, as production IVF deployments do.
   */
  def kmeansCentroids(
      spark: SparkSession, df: DataFrame, id: String, vec: String,
      k: Int, iterations: Int = 3): Seq[(Int, Seq[Float])] = {
    var centroids: Seq[(Int, Seq[Float])] = df.orderBy(col(id)).limit(k)
      .select(col(vec)).collect()
      .map(_.getSeq[Float](0).toSeq).zipWithIndex.map(_.swap).toSeq
    for (_ <- 0 until iterations) {
      val updated = assignToCentroids(spark, df, vec, centroids)
        .select(col("cluster_id"), posexplode(col(vec)).as(Seq("__gpos", "__gval")))
        .groupBy("cluster_id", "__gpos")
        .agg(avg(col("__gval")).as("__gmean"))          // map-side partials; k·dim rows out
        .groupBy("cluster_id")
        .agg(array_sort(collect_list(struct(col("__gpos"), col("__gmean")))).as("__gpairs"))
        .select(col("cluster_id"),
          expr("transform(__gpairs, p -> CAST(p.__gmean AS FLOAT))").as("centroid"))
        .collect()                                       // k tiny rows, like agg-to-literal medians
        .map(r => r.getAs[Number]("cluster_id").intValue -> r.getSeq[Float](1).toSeq)
        .toMap
      centroids = centroids.map { case (cid, prev) =>
        cid -> updated.getOrElse(cid, prev)              // empty cluster keeps its centroid
      }
    }
    centroids
  }

  /**
   * Nearest-centroid assignment with ZERO shuffle: the k centroids ride
   * into the plan as a literal array and each row computes its argmax
   * cosine inside one codegen'd `aggregate` — no join, no row explosion.
   */
  def assignToCentroids(
      spark: SparkSession, df: DataFrame, vec: String,
      centroids: Seq[(Int, Seq[Float])]): DataFrame = {
    GraftFunctions.register(spark)
    val centLit = array(centroids.map { case (cid, v) =>
      struct(lit(cid).as("cid"),
        array(v.map(x => lit(x)): _*).as("centroid"))
    }: _*)
    val best = aggregate(
      centLit,
      struct(lit(-2.0d).as("sim"), lit(-1).as("cid")),
      (acc, c) => {
        val sim = call_function(GraftFunctions.cosineName, col(vec), c.getField("centroid"))
        when(sim > acc.getField("sim"),
          struct(sim.as("sim"), c.getField("cid").as("cid"))).otherwise(acc)
      })
    df.withColumn("cluster_id", best.getField("cid"))
  }

  /**
   * IVF approximate top-k: the corpus is coarsely quantized once into
   * `nlist` centroid cells (in production the assignment is persisted as
   * a bucketed table); each query probes only its `nprobe` nearest cells,
   * so probe cost is ~|corpus|·nprobe/nlist instead of |corpus|. The
   * centroid table is tiny and broadcast everywhere — the corpus never
   * shuffles for a search.
   */
  def ivfTopK(
      spark: SparkSession,
      corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iterations: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(spark, corpus, id, vec, nlist, iterations)
    val cells = assignToCentroids(spark, corpus, vec, centroids)
    val centroidRows = centroids.map { case (cid, v) => (cid, v) }
    import spark.implicits._
    val centroidDf = centroidRows.toDF("cluster_id", "centroid")
      .withColumn("centroid", col("centroid").cast("array<float>"))
    val probes = queries
      .select(col(id).as("query_id"), col(vec).as("__qvec"))
      .join(broadcast(centroidDf))
      .withColumn("__gcsim", cosine(spark, col("__qvec"), col("centroid")))
      .withColumn("__grk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("__gcsim").desc, col("cluster_id").asc)))
      .filter(col("__grk") <= nprobe)
      .select(col("query_id"), col("__qvec"), col("cluster_id"))
    val w = Window.partitionBy("query_id").orderBy(col("__gsim").desc, col(id).asc)
    cells
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col(id) =!= col("query_id"))
      .withColumn("__gsim", cosine(spark, col(vec), col("__qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(id).as("neighbor_id"))
  }

  /**
   * Embedding near-duplicate pairs: LSH-bucket self-join → cosine ≥
   * threshold. The all-pairs comparison only happens within buckets.
   */
  def embeddingNearDups(
      spark: SparkSession, df: DataFrame,
      id: String, vec: String, threshold: Double, bits: Int = 12): DataFrame = {
    val bucketed = df.select(col(id).as("__gid"), col(vec).as("__gvec"))
      .withColumn("__gbucket", hyperplaneBucket(col("__gvec"), bits))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.__gbucket") === col("b.__gbucket") && col("a.__gid") < col("b.__gid"))
      .withColumn("cosine", cosine(spark, col("a.__gvec"), col("b.__gvec")))
      .filter(col("cosine") >= threshold)
      .select(col("a.__gid").as("id_a"), col("b.__gid").as("id_b"), col("cosine"))
  }
}
