package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the fraction of a text's word n-grams
 * taken by the single most frequent one — the Gopher repetition gate
 * (SURVEY §2.5 #61) — in ONE byte walk plus one hash-map count.
 *
 * Value-identical on non-null input to the declarative
 * `TextFns.topNGramFraction(split(text, " "), n)` (sorted-gram-array
 * `aggregate` fold): grams are the exact byte ranges between token
 * boundaries (the [[WordShingles]] trick), counted as real substrings in
 * a transient hash map — exact, not hash-sketched, so the DuckDB oracle
 * match is unaffected. The declarative fold pays an interpreted lambda
 * per gram plus a string sort; this is a flat loop, which matters for a
 * gate that runs over every document of a pretraining corpus.
 *
 * Divergence on NULL input only: this expression null-propagates, while
 * the declarative form's `when` falls through to 0.0 (size(null) is
 * null under ANSI). Matches the corpus contract (documents.text is
 * non-null); the parity spec pins non-null inputs.
 */
case class TopGramShare(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n >= 1 (got $n)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_top_gram_share"

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    TopGramShare.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val cls = TopGramShare.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($x, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopGramShare {
  /** Shared by eval and codegen: one byte walk, exact substring counts. */
  def compute(s: UTF8String, n: Int): Double = {
    val bytes = s.getBytes
    val len = bytes.length
    // token boundaries, split on single 0x20 (cannot occur inside a
    // multi-byte UTF-8 code point)
    var tokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) tokens += 1; i += 1 }
    if (tokens < n) return 0.0
    val starts = new Array[Int](tokens)
    var t = 1
    i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }; i += 1 }
    val gramCount = tokens - n + 1
    val counts = new java.util.HashMap[UTF8String, Array[Int]](gramCount * 2)
    var max = 0
    var j = 0
    while (j < gramCount) {
      val start = starts(j)
      val end = if (j + n < tokens) starts(j + n) - 1 else len
      val gram = UTF8String.fromBytes(bytes, start, end - start)
      var cell = counts.get(gram)
      if (cell == null) { cell = new Array[Int](1); counts.put(gram, cell) }
      cell(0) += 1
      if (cell(0) > max) max = cell(0)
      j += 1
    }
    max.toDouble / gramCount
  }
}
