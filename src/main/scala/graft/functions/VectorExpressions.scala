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

/** Exact-integer quantized squared L2 distance:
  * Σᵢ floor((aᵢ−bᵢ)² · 2^scaleBits) as BIGINT — the summation is exact
  * integer arithmetic, so it is order-independent and replayable
  * bit-for-bit by a DuckDB `sum()` (the AnnQueries 2^45 discipline that
  * makes every float-heavy query here hash-match). Codegen loop like
  * [[CosineDistance]]; the k-means assignment kernel.
  */
case class QuantizedL2Expr(left: org.apache.spark.sql.catalyst.expressions.Expression,
                           right: org.apache.spark.sql.catalyst.expressions.Expression,
                           scaleBits: Int = 45)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(scaleBits > 0 && scaleBits < 62)
  private val scale: Double = java.lang.Math.scalb(1.0, scaleBits)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += java.lang.Math.floor(d * d * scale).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += (long) java.lang.Math.floor($d * $d * ${scale}D);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.catalyst.expressions.Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedL2Expr {
  def column(a: Column, b: Column, scaleBits: Int = 45): Column =
    GraftShim.column(QuantizedL2Expr(
      GraftShim.expression(a), GraftShim.expression(b), scaleBits))
}
