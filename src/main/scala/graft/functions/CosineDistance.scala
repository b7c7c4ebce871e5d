package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst cosine-distance expression: `1 − a·b / (‖a‖·‖b‖)`
  * over two `array<double>` columns.
  *
  * This is the Spark-idiomatic analog of the reference's AVX2+FMA kernel
  * (`vector-db.c:179-219`): a fused primitive loop emitted by
  * `doGenCode` directly into WholeStageCodegen, which C2 JIT-compiles
  * (and auto-vectorizes) — versus the `zip_with`+`aggregate`
  * higher-order-function route, which is CodegenFallback (interpreted
  * per row, allocating an intermediate array per element pass).
  *
  * Numerics: three independent accumulators added in index order — the
  * exact op sequence of the HOF formulation and of the DuckDB oracle's
  * sequential fold (`VectorFunctions.cosDistSql`), so results are
  * bit-identical across all three. No Kahan compensation, matching the
  * reference's SIMD path (`vector-db.c:199-207`, its Kahan variant is
  * the non-SIMD fallback only).
  */
case class CosineDistance(left: Expression, right: Expression,
    asDistance: Boolean = true)
    extends BinaryExpression {

  // inputs are produced by this library's own operators, always
  // array<double>; no user-facing SQL registration needs type coercion
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      ab += xi * yi; aa += xi * xi; bb += yi * yi
      i += 1
    }
    val sim = ab / (math.sqrt(aa) * math.sqrt(bb))
    if (asDistance) 1.0 - sim else sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $ab = 0.0, $aa = 0.0, $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
         |}
         |${ev.value} = ${if (asDistance) "1.0 - " else ""}$ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineDistance {
  /** Column forms of the codegen expression. */
  def distance(a: Column, b: Column): Column =
    GraftShim.column(
      CosineDistance(GraftShim.expression(a), GraftShim.expression(b)))
  def similarity(a: Column, b: Column): Column =
    GraftShim.column(
      CosineDistance(GraftShim.expression(a), GraftShim.expression(b), asDistance = false))
}
