package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/**
 * Vector column builders over `ARRAY<FLOAT>` embeddings (SURVEY §4).
 * Everything is a codegen'd higher-order expression — no UDFs — so these
 * compose inside whole-stage codegen over any corpus size. Cosine has a
 * dedicated native expression ([[graft.plans.CosineSimilarity]]) because
 * it dominates similarity-search hot paths.
 */
object Vectors {

  /** Dot product in double precision (each element widened before multiply). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  /** L2 norm in double precision. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Unit-normalized copy (zero vectors pass through unchanged). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0d, a)
      .otherwise(transform(a, x => (x.cast("double") / n).cast("float")))
  }

  /** Cosine via the native codegen expression (registers it on first use). */
  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    GraftFunctions.register(spark)
    call_function(GraftFunctions.cosineName, a, b)
  }

  /** Euclidean distance in double precision. */
  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0d), (acc, v) => acc + v))
}
