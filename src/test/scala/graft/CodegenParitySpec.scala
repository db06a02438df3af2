package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFns
import graft.operators.Dedup

/**
 * Property parity: every one-pass codegen expression must be
 * value-identical to its declarative reference form on generated
 * adversarial strings — separator runs, leading/trailing spaces,
 * punctuation, multi-byte code points, empty strings.
 */
class CodegenParitySpec extends SparkSpec {
  import spark.implicits._

  private val charGen = Gen.frequency(
    (6, Gen.alphaNumChar),
    (3, Gen.const(' ')),
    (1, Gen.oneOf('é', 'ö', '中', '!', '\'', ',', '0')))

  private val textGen = Gen.chooseNum(0, 60)
    .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  private def texts(seed: Long): Seq[String] =
    (0 until 30).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(seed * 1000 + i)))

  test("wordShingles / minhash / simhash codegen == declarative on generated text") {
    for (seed <- 1L to 5L) {
      val df = texts(seed).toDF("t")
      for (k <- Seq(1, 2, 3)) {
        val sh = df.select(
          TextFns.wordShingles(spark, col("t"), k).as("fast"),
          TextFns.wordShingles(TextFns.tokens(col("t")), k).as("ref")).collect()
        sh.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"seed=$seed k=$k: ${r.getSeq[String](0)} != ${r.getSeq[String](1)}"))
      }
      val sig = df.select(
        Dedup.minhashSignature(spark, TextFns.wordShingles(spark, col("t"), 2), 16).as("fast"),
        Dedup.minhashSignatureDeclarative(TextFns.wordShingles(spark, col("t"), 2), 16).as("ref"))
        .collect()
      sig.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"seed=$seed minhash"))
      val sim = df.select(
        Dedup.simhashSignature(spark, TextFns.tokens(col("t"))).as("fast"),
        Dedup.simhash64(transform(TextFns.tokens(col("t")), t => xxhash64(t))).as("ref"))
        .collect()
      sim.foreach(r => assert(r.getLong(0) == r.getLong(1), s"seed=$seed simhash"))
    }
  }

  test("topGramShare codegen == declarative sorted-fold on generated text") {
    for (seed <- 1L to 5L) {
      val df = texts(seed).toDF("t")
      for (n <- Seq(1, 2, 3)) {
        val rows = df.select(
          TextFns.topNGramFraction(spark, col("t"), n).as("fast"),
          TextFns.topNGramFraction(TextFns.tokens(col("t")), n).as("ref"),
          col("t")).collect()
        rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
          s"seed=$seed n=$n '${r.getString(2)}': ${r.getDouble(0)} != ${r.getDouble(1)}"))
      }
    }
  }

  test("charGramJaccard codegen == declarative on generated text pairs") {
    for (seed <- 1L to 5L) {
      val ts = texts(seed)
      val pairs = ts.zip(ts.tail :+ ts.head).toDF("a", "b")
      for (k <- Seq(2, 3, 5)) {
        val out = pairs.select(
          TextFns.charGramJaccard(spark, col("a"), col("b"), k).as("fast"),
          TextFns.jaccard(TextFns.charGrams(col("a"), k),
            TextFns.charGrams(col("b"), k)).as("ref")).collect()
        out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
          s"seed=$seed k=$k: ${r.getDouble(0)} != ${r.getDouble(1)}"))
      }
    }
  }

  test("charGramContainment codegen == declarative; excerpt-in-document scores 1.0") {
    for (seed <- 1L to 5L) {
      val ts = texts(seed)
      val pairs = ts.zip(ts.tail :+ ts.head).toDF("a", "b")
      for (k <- Seq(2, 3, 5)) {
        val out = pairs.select(
          TextFns.charGramContainment(spark, col("a"), col("b"), k).as("fast"),
          (size(array_intersect(TextFns.charGrams(col("a"), k),
            TextFns.charGrams(col("b"), k))).cast("double") /
            size(TextFns.charGrams(col("a"), k))).as("ref")).collect()
        out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
          s"seed=$seed k=$k: ${r.getDouble(0)} != ${r.getDouble(1)}"))
      }
    }
    // the asymmetry this metric exists for: excerpt ⊂ document
    val d = Seq(("ghijklmnop", "abcdefghijklmnopqrstuvwxyz")).toDF("a", "b")
    val r = d.select(
      TextFns.charGramContainment(spark, col("a"), col("b"), 3).as("ab"),
      TextFns.charGramContainment(spark, col("b"), col("a"), 3).as("ba"),
      TextFns.charGramJaccard(spark, col("a"), col("b"), 3).as("jac")).head
    assert(r.getDouble(0) == 1.0)           // every excerpt gram is in the doc
    assert(r.getDouble(1) < 0.5 && r.getDouble(2) < 0.5) // reverse + jaccard dilute
  }
}
