/* Hosted in org.apache.spark.sql (see GraftExprs.scala): aggregate
 * expressions need the private[sql] Column<->Expression bridge.
 */
package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Growable elementwise double accumulator for [[VectorSum]]. The buffer
  * grows to the longest vector seen; shorter vectors read as zero-padded
  * (the engine-wide short-dimension convention).
  */
final class VecSumBuf extends Serializable {
  var sums: Array[Double] = Array.emptyDoubleArray
  var seen: Boolean = false

  private def ensure(n: Int): Unit =
    if (sums.length < n) sums = java.util.Arrays.copyOf(sums, n)

  def add(v: ArrayData): Unit = {
    val n = v.numElements()
    ensure(n)
    seen = true
    var i = 0
    while (i < n) { sums(i) += v.getFloat(i); i += 1 }
  }

  def merge(o: VecSumBuf): VecSumBuf = {
    if (o.seen) {
      ensure(o.sums.length)
      seen = true
      var i = 0
      while (i < o.sums.length) { sums(i) += o.sums(i); i += 1 }
    }
    this
  }
}

/** Elementwise sum of `array<float>` vectors as `array<double>` — the
  * per-cluster accumulation step of distributed k-means (and any other
  * vector-mean aggregation). A `TypedImperativeAggregate`, so the
  * map-side partial aggregation keeps one dim-sized double buffer per
  * group per partition and the shuffle carries |partitions| × |groups|
  * buffers — never the vectors themselves. The built-in alternative
  * (posexplode + groupBy(pos) + sum) shuffles dim× the row count per
  * iteration; this keeps the exchange at the codebook's own size.
  *
  * Null vectors are skipped; an all-null group evaluates to NULL (matching
  * `sum`'s convention). Double accumulation of float inputs — the same
  * arithmetic as the driver-side Lloyd kernel it feeds.
  */
case class VectorSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuf] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf

  override def update(buf: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(b1: VecSumBuf, b2: VecSumBuf): VecSumBuf = b1.merge(b2)

  override def eval(buf: VecSumBuf): Any =
    if (!buf.seen) null
    else new GenericArrayData(buf.sums.clone().asInstanceOf[Array[_]])

  override def serialize(buf: VecSumBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.seen)
    out.writeInt(buf.sums.length)
    var i = 0
    while (i < buf.sums.length) { out.writeDouble(buf.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new VecSumBuf
    buf.seen = in.readBoolean()
    val n = in.readInt()
    buf.sums = new Array[Double](n)
    var i = 0
    while (i < n) { buf.sums(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSum =
    copy(child = newChildren(0))
}
