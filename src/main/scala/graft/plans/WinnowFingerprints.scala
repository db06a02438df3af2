package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: winnowing document fingerprints
 * (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS algorithm) in one
 * pass. Rolling char-k-gram hashes; each window of `w` consecutive gram
 * hashes selects its minimum (rightmost on ties), and the distinct
 * selected hashes — sorted, deduped — are the document's fingerprints.
 *
 * Guarantees: any shared substring of length >= k + w - 1 between two
 * documents produces at least one shared fingerprint, and fingerprints
 * are position-independent — unlike q28's whole-text md5, which any
 * one-character edit changes completely. Fingerprint density is ~2/(w+1)
 * of the gram count, so the per-document state is small and the
 * candidate join stays band-bucketed, never all-pairs.
 *
 * Gram hashes are XXH64 over the gram's byte range in place (seed 42) —
 * no substring allocation at all; the byte walk records code-point
 * offsets once, as in [[CharGramJaccard]].
 */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs k >= 1 and w >= 1 (got k=$k, w=$w)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_winnow"

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cls = WinnowFingerprints.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($x, $k, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Shared by eval and codegen. */
  def compute(s: UTF8String, k: Int, w: Int): UnsafeArrayData = {
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
    // texts shorter than k collapse to one whole-text gram (q31 parity)
    val grams = math.max(chars - k + 1, 1)
    val hashes = new Array[Long](grams)
    var g = 0
    while (g < grams) {
      val start = offs(g)
      val end = offs(math.min(g + k, chars))
      hashes(g) = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      g += 1
    }
    // winnow: rightmost minimum of each w-window, recording each selected
    // POSITION once; windows shorter than w (few grams) use all grams
    val win = math.min(w, grams)
    val selected = new java.util.TreeSet[java.lang.Long]()
    var lastIdx = -1
    var sStart = 0
    while (sStart <= grams - win) {
      var minIdx = sStart
      var j = sStart + 1
      while (j < sStart + win) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      if (minIdx != lastIdx) {
        selected.add(hashes(minIdx))
        lastIdx = minIdx
      }
      sStart += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
