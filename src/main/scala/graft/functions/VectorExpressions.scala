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

/** Random-projection sketch (JL): `out(j) = Σᵢ s(i,j)·floor(xᵢ·2^52)
  * / 2^52` with ±1 signs from integer hash parity
  * (`((i·1000003 + j·7919) % 97) % 2`). The inner accumulation is exact
  * BIGINT (order-independent, oracle-replayable — the same 2^52
  * discipline as the centroid queries); only the final per-dim division
  * returns to double, and a power-of-two division is exact scaling.
  * Replaces the interpreted nested-HOF formulation
  * (`transform(seq, j -> aggregate(...))`, kept as a cross-check in
  * VectorFunctionsSpec) with one primitive double loop inside
  * WholeStageCodegen — at 100 TB the projection runs over every vector,
  * a hot kernel like [[CosineDistance]].
  */
case class RandomProjExpr(child: Expression, outDims: Int = 16)
    extends UnaryExpression {
  require(outDims > 0 && outDims <= 64)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorKernels.randomProj(a, outDims))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // the loop lives in a static kernel shared with the interpreted
      // path (same pattern as the hash kernels): codegen emits one call
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.VectorKernels.randomProj($c, $outDims));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RandomProjExpr {
  def column(v: Column, outDims: Int = 16): Column =
    GraftShim.column(RandomProjExpr(GraftShim.expression(v), outDims))
}

/** Static kernels callable from both interpreted eval and generated
  * code (the JVM JIT inlines them either way).
  */
object VectorKernels {
  private final val S52 = 4503599627370496.0 // 2^52

  def randomProj(v: ArrayData, outDims: Int): Array[Double] = {
    val n = v.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = java.lang.Math.floor(v.getDouble(i) * S52).toLong
      i += 1
    }
    val out = new Array[Double](outDims)
    var j = 0
    while (j < outDims) {
      var acc = 0L
      i = 0
      while (i < n) {
        acc += (if (((i * 1000003 + j * 7919) % 97) % 2 == 0) q(i) else -q(i))
        i += 1
      }
      out(j) = acc.toDouble / S52
      j += 1
    }
    out
  }
}
