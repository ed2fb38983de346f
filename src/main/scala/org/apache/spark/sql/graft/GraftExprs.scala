/* Hosted inside the org.apache.spark.sql namespace deliberately: custom
 * Catalyst expressions need `private[sql]` surface (AbstractDataType for
 * ExpectsInputTypes, ExpressionUtils for Column<->Expression interop) —
 * the standard packaging pattern for third-party Spark extension
 * libraries. All user-facing API re-exports live in graft.functions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native codegen fold over two float vectors (SURVEY.md §7.3.2): double
  * accumulation over float elements in index order — identical arithmetic
  * to the higher-order-function oracle in graft.functions.Dist, but a
  * tight primitive loop inside whole-stage codegen (no per-element lambda
  * dispatch, no boxing). Elements beyond the shorter input are ignored —
  * the engine-wide short-dimension convention. NOTE this deliberately
  * DIVERGES from a `zip_with`-based formulation on ragged or null-element
  * inputs (zip_with null-pads the shorter array, so the HOF oracle in
  * [[graft.functions.Dist]] yields NULL there): the bit-identity contract
  * with the oracle holds on equal-dimension, non-null-element vectors,
  * which is what the kNN layer feeds both.
  */
abstract class FloatVectorFold extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  protected def kernel(acc: Double, x: Float, y: Float): Double
  protected def kernelCode(acc: String, x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = kernel(acc, xs.getFloat(i), ys.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $x = $a.getFloat($i);
         |  float $y = $b.getFloat($i);
         |  ${kernelCode(acc, x, y)}
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Squared L2 distance (FAISS IndexFlatL2 convention — stored squared,
  * rooted only at the joinability threshold).
  */
case class SquaredL2(left: Expression, right: Expression) extends FloatVectorFold {
  override protected def kernel(acc: Double, x: Float, y: Float): Double = {
    val d = x.toDouble - y.toDouble
    acc + d * d
  }
  override protected def kernelCode(acc: String, x: String, y: String): String =
    s"double d_$x = (double) $x - (double) $y; $acc += d_$x * d_$x;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "squared_l2"
}

/** Dot product over float vectors. */
case class DotProduct(left: Expression, right: Expression) extends FloatVectorFold {
  override protected def kernel(acc: Double, x: Float, y: Float): Double =
    acc + x.toDouble * y.toDouble
  override protected def kernelCode(acc: String, x: String, y: String): String =
    s"$acc += (double) $x * (double) $y;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Public Column<->Expression bridge for the graft packages. Conversion to
  * Expression is EAGER (ColumnNodeToExpressionConverter): the lazy wrapper
  * ExpressionUtils.expression returns is only unwrapped by the classic
  * Dataset API, not by the analyzer — a function-registry builder that
  * returned it would reach codegen unresolved.
  */
object Interop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
