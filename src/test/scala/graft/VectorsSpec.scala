package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq((Seq(3f, 4f), Seq(1f, 0f))).toDF("a", "b")

  test("dot, norms, euclidean compute reference values") {
    val r = df.select(
      Vectors.dot(col("a"), col("b")).as("d"),
      Vectors.l2Norm(col("a")).as("n"),
      Vectors.euclidean(col("a"), col("b")).as("e")).collect().head
    assert(r.getDouble(0) == 3.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getDouble(2) == math.sqrt(4 + 16))
  }

  test("l2Normalize produces unit vectors and passes zero vectors through") {
    val n = df.select(Vectors.l2Norm(Vectors.l2Normalize(col("a"))).as("n"))
      .collect().head.getDouble(0)
    assert(math.abs(n - 1.0) < 1e-7)
    val z = Seq(Seq(0f, 0f)).toDF("a")
      .select(Vectors.l2Normalize(col("a")).as("z")).collect().head.getSeq[Float](0)
    assert(z == Seq(0f, 0f))
  }

  test("cosine agrees between Vectors builder and the raw expression") {
    val viaVectors = df.select(Vectors.cosine(spark, col("a"), col("b")).as("c"))
      .collect().head.getDouble(0)
    assert(viaVectors == 3.0 / 5.0)
  }
}
