/* Hosted in org.apache.spark.sql (see GraftExprs.scala). */
package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, FloatType}

import graft.knn.PqCodebooks

/** Product-quantization encode kernel: holds the trained codebooks as a
  * Spark `Broadcast` (same shipping rationale as [[CentroidKernel]] — the
  * expression serializes as a handle; a large codebook tensor rides the
  * torrent protocol once per executor, not per task). Encoding touches
  * EVERY candidate row at build time, so it runs as a codegen expression
  * reading primitives straight off `ArrayData`.
  */
final class PqKernel(bc: Broadcast[PqCodebooks]) extends Serializable {

  @transient private lazy val cb: PqCodebooks = bc.value

  def encode(v: ArrayData): Array[Byte] = cb.encode(v)

  def adcDirect(q: ArrayData, code: Array[Byte]): Double = cb.adcDirect(q, code)
}

/** PQ code for a float vector: `binary` of `m` bytes, one sub-centroid id
  * per subspace (see [[graft.knn.PqCodebooks.encode]]).
  */
case class PqEncode(child: Expression, kernel: PqKernel)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    kernel.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.encode($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Row-wise ADC distance: approximate squared L2 from an un-quantized
  * query vector straight to a PQ code (see
  * [[graft.knn.PqCodebooks.adcDirect]]) — the scoring expression for
  * relational joins over code columns, where the scan reads m bytes per
  * candidate instead of the vector.
  */
case class PqAdc(left: Expression, right: Expression, kernel: PqKernel)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(q: Any, code: Any): Any =
    kernel.adcDirect(q.asInstanceOf[ArrayData], code.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $ref.adcDirect($q, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
