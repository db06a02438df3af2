package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the distinct word k-shingles of a
 * single-space-tokenized text in ONE pass (SURVEY §2.2 #29).
 *
 * Value-identical (as a set; order is first-occurrence) to
 * `array_distinct(transform(sequence(...), i => array_join(slice(split(
 * text, " "), i+1, k), " ")))`: joining k consecutive tokens with the
 * same single-space separator reproduces the exact byte range of the
 * original text between those token boundaries, so shingles are sliced
 * straight out of one byte walk that records separator offsets — no
 * token array, no per-shingle slice/join allocations, no O(n²)
 * re-scans. Texts with fewer than k tokens collapse to one whole-text
 * shingle, matching the declarative form.
 */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs k >= 1 (got $k)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_shingles"

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cls = WordShingles.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($x, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  /** Shared by eval and codegen: one byte walk, shingles as byte slices. */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token boundaries: starts(i) = first byte of token i,
    // ends(i) = one past its last byte (split on single 0x20, so a
    // separator byte inside a multi-byte code point cannot occur)
    var tokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) tokens += 1; i += 1 }
    val starts = new Array[Int](tokens)
    var t = 1
    starts(0) = 0
    i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }; i += 1 }
    val set = new java.util.LinkedHashSet[UTF8String]()
    if (tokens < k) {
      set.add(s) // fewer than k tokens -> one whole-text shingle
    } else {
      var j = 0
      while (j <= tokens - k) {
        val start = starts(j)
        // end of token j+k-1: next separator minus 1, or end of text
        val end = if (j + k < tokens) starts(j + k) - 1 else n
        set.add(UTF8String.fromBytes(bytes, start, end - start))
        j += 1
      }
    }
    val out = new Array[AnyRef](set.size)
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
