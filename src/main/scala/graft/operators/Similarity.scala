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
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.cosineName, a, b)
  }

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
