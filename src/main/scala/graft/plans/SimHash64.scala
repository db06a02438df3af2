package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: the 64-bit SimHash of a token array in ONE
 * pass (SURVEY §2.2 #30).
 *
 * Bit-for-bit identical to the explode → 64-bit-vote-sum pipeline shape
 * (each token hashed via xxhash64, every hash bit voting ±1, the vote
 * sign becoming the output bit) but evaluated per row in a tight loop:
 * no exploded (doc, token) rows, no 64-column vote aggregate, no
 * shuffle. A null token contributes hash 42 (Spark's `xxhash64(NULL)`),
 * matching the pipeline. An empty token array yields 0L (all votes tie
 * at zero) — a TOTAL result, deliberately not NULL: a null-guard filter
 * on the computed column gets predicate-pushed below the projection and
 * makes Catalyst evaluate the hash twice per row. Empty documents share
 * hash 0 and block together, which is semantically right (they are
 * identical, Hamming 0).
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash64"

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = if (x.isNullAt(i)) 42L else XXH64.hashUTF8String(x.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val votes = ctx.freshName("votes"); val h = ctx.freshName("h")
      s"""
         |int $n = $x.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $x.isNullAt($i) ? 42L : $xxh.hashUTF8String($x.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long ${ev.value}_acc = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) ${ev.value}_acc |= (1L << $b);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
