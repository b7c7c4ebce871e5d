package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Sign-bit packing as a codegen expression: bit i of the result is set
  * iff v(i) > 0, for the first `bits` (≤ 62) elements of an
  * `array<double>` column — element 0 is the LSB, the exact fold order
  * of the HOF formulation ([[VectorFunctions.packSignBitsHof]]:
  * `aggregate(reverse(slice(v,1,bits)), 0L, acc*2+bit)`) and of the
  * DuckDB oracle fragment ([[VectorFunctions.packSignBitsSql]]), so all
  * three agree exactly (pure integer algebra).
  *
  * The HOF route is CodegenFallback — per row it materializes a sliced
  * and a reversed array and runs an interpreted per-element lambda; this
  * expression is one primitive loop inside WholeStageCodegen. Feeds the
  * sign-LSH near-dup blocking and the hamming retrieval, both of which
  * scan every vector — at 100 TB this is a hot kernel, like
  * [[CosineDistance]].
  */
case class PackSignBitsExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits <= 62, "BIGINT pack: at most 62 sign bits")
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(bits, a.numElements())
    var acc = 0L
    var i = n - 1
    while (i >= 0) {
      acc = acc * 2 + (if (a.getDouble(i) > 0.0) 1L else 0L)
      i -= 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($bits, $c.numElements());
         |long $acc = 0L;
         |for (int $i = $n - 1; $i >= 0; $i--) {
         |  $acc = $acc * 2L + ($c.getDouble($i) > 0.0 ? 1L : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PackSignBitsExpr {
  def column(v: Column, bits: Int): Column =
    GraftShim.column(PackSignBitsExpr(GraftShim.expression(v), bits))
}
