package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins the at-scale contract of [[Similarity.pcaPower]]'s sampled
  * training (`trainSampleSize > 0`): loadings trained on a bounded
  * hash-ordered sample point in the SAME direction as the full-corpus
  * loadings — |cos(sample, full)| ≥ 0.99 on the sf0.01 embedding cloud
  * given an identifiable first PC — so the O(sample·d²) covariance
  * build can replace the 100 TB scan without moving the principal axis.
  *
  * Identifiability caveat, measured on the raw sf0.01 embeddings:
  * their spectrum is near-isotropic (λ1/λ2 ≈ 1.013), so NO estimator —
  * sampled or full-data — has a stable first PC there (resampling the
  * corpus itself moves it; a 400/500 subsample lands at cos ≈ 0.68).
  * The spec therefore stretches coordinate 0 by 5× (λ1/λ2 ≈ 14.8), the
  * regime where a dominant direction exists to recover — which is
  * exactly when a production caller reads pc1. The sign is NOT pinned
  * (power iteration's sign follows the start vector's projection),
  * hence the absolute value.
  */
class PcaSampleSpec extends SparkSpec {
  private lazy val sf001 = "/root/testdata/sf0.01"

  private def loadingVec(df: org.apache.spark.sql.DataFrame): Array[Double] =
    df.select(col("pos"), col("loading")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)

  test("sampled loadings align with full-corpus loadings on a gapped sf0.01 cloud (|cos| >= 0.99)") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .withColumn("embedding", expr(
        "transform(embedding, (x, i) -> CASE WHEN i = 0 " +
          "THEN x * CAST(5.0 AS FLOAT) ELSE x END)"))
    val full = loadingVec(
      Similarity.pcaPower(emb, "vec_id", "embedding", iters = 3))
    val samp = loadingVec(
      Similarity.pcaPower(emb, "vec_id", "embedding", iters = 3,
        trainSampleSize = 250))
    assert(full.length === samp.length)
    val dot = full.zip(samp).map { case (a, b) => a * b }.sum
    val na = math.sqrt(full.map(x => x * x).sum)
    val nb = math.sqrt(samp.map(x => x * x).sum)
    val cos = math.abs(dot / (na * nb))
    assert(cos >= 0.99, s"sample/full loading cosine $cos below 0.99")
  }

  test("trainSampleSize = 0 is the identity (oracle-entry form unchanged)") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet").limit(50)
    val a = Similarity.pcaPower(emb, "vec_id", "embedding", iters = 2)
      .orderBy("pos").collect()
    val b = Similarity.pcaPower(emb, "vec_id", "embedding", iters = 2,
      trainSampleSize = 0).orderBy("pos").collect()
    assert(a.sameElements(b))
  }
}
