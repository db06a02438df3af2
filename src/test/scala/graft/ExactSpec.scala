package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Exact

class ExactSpec extends SparkSpec {
  import spark.implicits._

  test("decSum is partition-order independent (the reason it exists)") {
    val vals = Seq.tabulate(1000)(i => (i % 7) * 0.123 + 0.001)
    val r1 = vals.toDF("v").repartition(1).agg(Exact.decSum(col("v"))).head.getDouble(0)
    val r8 = vals.toDF("v").repartition(8).agg(Exact.decSum(col("v"))).head.getDouble(0)
    assert(r1 == r8) // bit-identical, not approximately equal
  }

  test("decAvg divides the exact sum by the row count") {
    val r = Seq(1.0, 2.0, 4.0).toDF("v")
      .agg(Exact.decAvg(col("v")).as("a")).head.getDouble(0)
    assert(r == (1.0 + 2.0 + 4.0) / 3)
  }

  test("decCorr matches a reference Pearson computation and is partition-stable") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val ys = Seq(2.0, 4.1, 5.9, 8.2, 9.8)
    def ref: Double = {
      val n = xs.size.toDouble
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(b => b * b).sum
      (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val df = xs.zip(ys).toDF("x", "y")
    val r1 = df.repartition(1).agg(Exact.decCorr(col("x"), col("y"))).head.getDouble(0)
    val r4 = df.repartition(4).agg(Exact.decCorr(col("x"), col("y"))).head.getDouble(0)
    assert(r1 == r4)
    assert(math.abs(r1 - ref) < 1e-12)
    val sd = df.agg(Exact.decStddevPop(col("x"))).head.getDouble(0)
    assert(math.abs(sd - math.sqrt(2.0)) < 1e-12) // pop stddev of 1..5
  }

  test("decSkewnessPop/decKurtosisPop track Spark's built-ins and are layout independent") {
    val rnd = new scala.util.Random(7)
    // 2-decimal values in [0, 1] — inside the scale-2 exactness bounds
    val df = (1 to 2000).map(_ => rnd.nextInt(101) / 100.0).toDF("x")
    val Array(sk, ku) = df.agg(
        Exact.decSkewnessPop(col("x")).as("s"), Exact.decKurtosisPop(col("x")).as("k"))
      .head.toSeq.map(_.asInstanceOf[Double]).toArray
    val Array(skB, kuB) = df.agg(skewness(col("x")), kurtosis(col("x")))
      .head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(sk - skB) < 1e-9)
    assert(math.abs(ku - (kuB + 3.0)) < 1e-9) // built-in reports EXCESS kurtosis
    val again = df.repartition(17).agg(
        Exact.decSkewnessPop(col("x")), Exact.decKurtosisPop(col("x")))
      .head.toSeq.map(_.asInstanceOf[Double])
    assert(again == Seq(sk, ku)) // bit-equal across layouts
  }

  test("decSkewnessPop is NULL (not an ANSI error) for zero-variance groups") {
    val df = Seq(0.5, 0.5, 0.5).toDF("x")
    val r = df.agg(Exact.decSkewnessPop(col("x")), Exact.decKurtosisPop(col("x"))).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("decSum matches BigDecimal arithmetic on scalacheck-generated inputs") {
    val gen = Gen.listOfN(50, Gen.chooseNum(-1000.0, 1000.0))
    for (seed <- 1L to 5L) {
      val xs = gen.apply(Gen.Parameters.default, Seed(seed)).get
      val got = xs.toDF("v").agg(Exact.decSum(col("v"))).head.getDouble(0)
      val want = xs.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(got == want, s"seed=$seed")
    }
  }
}
