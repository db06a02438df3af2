package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: exact Jaccard similarity of the distinct
 * character k-gram sets of two strings, in one pass (SURVEY §2.2 #31).
 *
 * Value-identical to `TextFns.jaccard(charGrams(a, k), charGrams(b, k))`
 * — grams are code-point substrings, texts shorter than k collapse to
 * one whole-text gram — but the gram sets live in transient hash sets
 * instead of Catalyst arrays: no per-side gram-array materialization
 * across the join shuffle, no array_distinct / array_intersect /
 * array_union generic-array passes. Exact (real substrings are compared,
 * not hashes), so the DuckDB oracle match is unaffected.
 */
case class CharGramJaccard(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs k >= 1 (got $k)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two STRING arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_chargram_jaccard"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CharGramJaccard.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = CharGramJaccard.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($a, $b, $k);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Native Catalyst expression: containment of `left`'s distinct char
 * k-gram set in `right`'s — |grams(A) ∩ grams(B)| / |grams(A)|. The
 * ASYMMETRIC near-dup score: a short excerpt fully copied into a long
 * document scores ~1.0 here while its Jaccard vanishes (the union is
 * dominated by the long side) — the sub-document duplication /
 * decontamination metric. Same one-pass hash-set machinery as
 * [[CharGramJaccard]]; |grams(A)| ≥ 1 by the whole-text-gram collapse,
 * so the division is total.
 */
case class CharGramContainment(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if k >= 1 => TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs k >= 1 (got $k)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two STRING arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_chargram_containment"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CharGramJaccard.computeContainment(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = CharGramJaccard.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.computeContainment($a, $b, $k);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharGramJaccard {
  /** Shared by eval and codegen: one pass per side, sets of real substrings. */
  def compute(a: UTF8String, b: UTF8String, k: Int): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    addGrams(a, k, setA, null)
    val setB = new java.util.HashSet[UTF8String]()
    val inter = addGrams(b, k, setB, setA)
    val union = setA.size + setB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Containment |grams(a) ∩ grams(b)| / |grams(a)| (total: |grams(a)| ≥ 1). */
  def computeContainment(a: UTF8String, b: UTF8String, k: Int): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    addGrams(a, k, setA, null)
    val setB = new java.util.HashSet[UTF8String]()
    val inter = addGrams(b, k, setB, setA)
    inter.toDouble / setA.size
  }

  /** Adds s's k-grams to `into`; returns how many distinct ones are in `other`. */
  private def addGrams(
      s: UTF8String, k: Int,
      into: java.util.HashSet[UTF8String],
      other: java.util.HashSet[UTF8String]): Int = {
    // UTF8String.substring(i, j) re-walks the bytes from position 0 on
    // every call — O(n²) per text. Walk once instead: record each code
    // point's byte offset, then slice grams straight out of the byte
    // array (fromBytes wraps without copying).
    val bytes = s.getBytes
    val n = bytes.length
    val offs = new Array[Int](n + 1)
    var chars = 0
    var i = 0
    while (i < n) {
      offs(chars) = i
      chars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(chars) = n
    // texts shorter than k collapse to one (whole-text) gram, matching
    // charGrams' greatest(length - k + 1, 1) sequence bound
    val grams = math.max(chars - k + 1, 1)
    var inter = 0
    var g = 0
    while (g < grams) {
      val start = offs(g)
      val end = offs(math.min(g + k, chars))
      val gram = UTF8String.fromBytes(bytes, start, end - start)
      if (into.add(gram) && other != null && other.contains(gram)) inter += 1
      g += 1
    }
    inter
  }
}
