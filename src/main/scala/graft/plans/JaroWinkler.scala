package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: Jaro-Winkler similarity in [0, 1] — the
 * classic record-linkage scorer for short entity strings (names, brands,
 * addresses), complementing threshold Levenshtein
 * ([[graft.operators.Dedup.editDistancePairs]]): edit distance counts
 * operations, Jaro-Winkler rewards shared prefixes and tolerates
 * transpositions, which is what human-keyed name variants look like.
 *
 * Standard parameters (Winkler 1990): prefix scale 0.1 over at most 4
 * leading code points, boost applied only when the Jaro score exceeds
 * 0.7. Transposition halves truncate (`mismatches / 2`, integer), the
 * RapidFuzz/DuckDB convention — chosen so scores are bit-comparable
 * with the DuckDB oracle.
 *
 * Code-point (not byte) comparisons; one pass decodes each side. No UDF:
 * both interpreted eval and `doGenCode` call the same static kernel, so
 * the expression stays inside whole-stage codegen in pair-scoring joins.
 */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two STRING arguments, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaro_winkler"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = JaroWinkler.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Shared by eval and codegen. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = codePoints(a)
    val s2 = codePoints(b)
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0

    // match window: chars count as matching within this distance
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window, l2 - 1)
      var j = lo
      var searching = true
      while (searching && j <= hi) {
        if (!m2(j) && s2(j) == s1(i)) {
          m1(i) = true; m2(j) = true; m += 1; searching = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    // transpositions: positional mismatches between the two matched
    // subsequences, halved with TRUNCATION (the mismatch count can be
    // odd, e.g. abc/bca) — the RapidFuzz/DuckDB convention, kept so
    // scores oracle-match engines that standardized on it
    var mismatches = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - mismatches / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro

    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && s1(p) == s2(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }

  /**
   * One walk over the UTF-8 bytes, packing each code point's byte
   * sequence into an int. UTF-8 is injective, so packed-byte equality
   * == code-point equality — no decode, no String allocation, and no
   * O(n²) re-walking (the UTF8String.substring trap).
   */
  private def codePoints(s: UTF8String): Array[Int] = {
    val bytes = s.getBytes
    val n = bytes.length
    var chars = 0
    var i = 0
    while (i < n) {
      chars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    val out = new Array[Int](chars)
    i = 0
    var c = 0
    while (i < n) {
      val len = math.min(UTF8String.numBytesForFirstByte(bytes(i)), n - i)
      var v = 0
      var j = 0
      while (j < len) {
        v = (v << 8) | (bytes(i + j) & 0xff)
        j += 1
      }
      out(c) = v
      c += 1
      i += len
    }
    out
  }
}
