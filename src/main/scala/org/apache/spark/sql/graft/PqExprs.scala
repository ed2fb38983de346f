/* Hosted in org.apache.spark.sql (see GraftExprs.scala). */
package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, FloatType}

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
