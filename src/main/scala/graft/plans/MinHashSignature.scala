package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: the full `numHashes`-permutation MinHash
 * signature of a shingle array in ONE pass — the hot path of MinHash-LSH
 * text dedup (SURVEY §2.2 #29).
 *
 * Bit-for-bit identical to the declarative universal-hashing
 * construction in [[graft.operators.Dedup.minhashSignature]]
 * (sig[h] = min over shingles of xxhash64(xxhash64(shingle), h), i.e.
 * XXH64.hashInt(h, hashLong(hashUTF8String(shingle, 42), 42))), but
 * each shingle string is hashed exactly once and the `numHashes` running
 * minimums update in a tight primitive loop: no exploded (doc, shingle)
 * rows, no `numHashes`-column partial-min aggregate, and — decisively at
 * 100 TB — no shuffle: the signature is a pure per-row projection.
 *
 * A null shingle element contributes base hash 42 (what Spark's
 * `xxhash64(NULL)` evaluates to), matching the declarative form. An
 * empty shingle array yields the all-Long.MaxValue sentinel signature —
 * a TOTAL result, deliberately not NULL: a null-guard filter on the
 * computed column gets predicate-pushed below the projection and makes
 * Catalyst evaluate the signature twice per row. Empty documents share
 * the sentinel signature and band together, which is semantically right
 * (they are identical) and harmless downstream (exact-Jaccard verify
 * yields NULL for empty sets and drops the pair).
 */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs numHashes >= 1 (got $numHashes)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = if (x.isNullAt(i)) 42L else XXH64.hashUTF8String(x.getUTF8String(i), 42L)
      val mixed = XXH64.hashLong(base, 42L)
      var h = 0
      while (h < numHashes) {
        val v = XXH64.hashInt(h, mixed)
        if (v < out(h)) out(h) = v
        h += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val out = ctx.freshName("out"); val base = ctx.freshName("base")
      val mixed = ctx.freshName("mixed"); val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $base = $x.isNullAt($i) ? 42L : $xxh.hashUTF8String($x.getUTF8String($i), 42L);
         |  long $mixed = $xxh.hashLong($base, 42L);
         |  for (int $h = 0; $h < $numHashes; $h++) {
         |    long $v = $xxh.hashInt($h, $mixed);
         |    if ($v < $out[$h]) $out[$h] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
