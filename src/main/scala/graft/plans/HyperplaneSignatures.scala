package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.{UnsafeArrayData, XXH64}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression: all `tables` random-hyperplane LSH bucket
 * ids of a float vector in ONE pass — the hot path of multi-table
 * vector LSH (SURVEY §2.2 #33-34).
 *
 * Bit-for-bit identical to the declarative reference construction in
 * [[graft.operators.Similarity.hyperplaneBucket]] (bit j of table t is
 * sign(Σ ±x_i) with the Rademacher sign drawn from
 * xxhash64(seed + t·7919, j, i), i.e. XXH64 folds of the three ints
 * from Spark's 42 base seed), but evaluated as a tight primitive loop:
 * the higher-order form materializes tables·bits intermediate arrays
 * per row, this expression materializes none — measured ~4× on the
 * q33/q34 bench.
 */
case class HyperplaneSignatures(child: Expression, bits: Int, tables: Int, seed: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if bits >= 1 && bits <= 31 && tables >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs 1 <= bits <= 31 (got $bits) and tables >= 1 (got $tables)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_hyperplanes"

  // A null element nulls every per-bit dot product in the declarative
  // form, collapsing that vector to bucket 0 in every table — reproduced
  // here so both forms bucket identically.
  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Int](tables)
    var anyNull = false
    var i = 0
    while (i < n && !anyNull) { anyNull = x.isNullAt(i); i += 1 }
    if (!anyNull) {
      var t = 0
      while (t < tables) {
        val hSeed = XXH64.hashInt(seed + t * 7919, 42L)
        var bucket = 0
        var j = 0
        while (j < bits) {
          val hj = XXH64.hashInt(j, hSeed)
          var dot = 0.0
          i = 0
          while (i < n) {
            val xi = x.getFloat(i).toDouble
            dot += (if (((XXH64.hashInt(i, hj) >> 7) & 1L) == 1L) xi else -xi)
            i += 1
          }
          if (dot > 0.0) bucket |= (1 << j)
          j += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullable: Boolean = child.nullable

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val t = ctx.freshName("t"); val j = ctx.freshName("j")
      val out = ctx.freshName("out"); val anyNull = ctx.freshName("anyNull")
      val hSeed = ctx.freshName("hSeed"); val hj = ctx.freshName("hj")
      val dot = ctx.freshName("dot"); val bucket = ctx.freshName("bucket")
      val xi = ctx.freshName("xi")
      s"""
         |int $n = $x.numElements();
         |int[] $out = new int[$tables];
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n && !$anyNull; $i++) $anyNull = $x.isNullAt($i);
         |if (!$anyNull) {
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $hSeed = $xxh.hashInt($seed + $t * 7919, 42L);
         |    int $bucket = 0;
         |    for (int $j = 0; $j < $bits; $j++) {
         |      long $hj = $xxh.hashInt($j, $hSeed);
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        double $xi = (double) $x.getFloat($i);
         |        $dot += ((($xxh.hashInt($i, $hj) >> 7) & 1L) == 1L) ? $xi : -$xi;
         |      }
         |      if ($dot > 0.0) $bucket |= (1 << $j);
         |    }
         |    $out[$t] = $bucket;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
