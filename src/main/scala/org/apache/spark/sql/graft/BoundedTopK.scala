/* Hosted in org.apache.spark.sql (see GraftExprs.scala): aggregate
 * expressions need the private[sql] Column<->Expression bridge.
 */
package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer over (longKey, stringValue) entries, kept sorted
  * ascending by (key, value). UTF8String comparison is binary — identical
  * to Spark's StringType sort order, so `bounded_topk(key, v, k)` returns
  * exactly the values a ranking window `ORDER BY key ASC, v ASC ... rn <= k`
  * would select, in the same order.
  */
final class TopKStrBuf(val k: Int) extends Serializable {
  val keys = new Array[Long](k)
  val vals = new Array[UTF8String](k)
  var size = 0

  def offer(key: Long, v: UTF8String): Unit = {
    if (size < k || key < keys(size - 1) ||
      (key == keys(size - 1) && v.compareTo(vals(size - 1)) < 0)) {
      var pos = if (size < k) size else size - 1
      while (pos > 0 && (keys(pos - 1) > key ||
        (keys(pos - 1) == key && vals(pos - 1).compareTo(v) > 0))) {
        keys(pos) = keys(pos - 1); vals(pos) = vals(pos - 1); pos -= 1
      }
      keys(pos) = key; vals(pos) = v
      if (size < k) size += 1
    }
  }

  def merge(o: TopKStrBuf): TopKStrBuf = {
    var i = 0
    while (i < o.size) { offer(o.keys(i), o.vals(i)); i += 1 }
    this
  }
}

/** Partial top-k aggregation: the scalable replacement for
  * `row_number().over(Window.partitionBy(g).orderBy(key, value))` + filter.
  * A ranking window routes EVERY row of a group through one reducer — for a
  * near-unique column that is O(N) rows in a single task, the profiler's
  * scale-killer at 100 TB. This aggregate keeps a k-sized buffer per group
  * per partition (map-side partial aggregation via ObjectHashAggregate), so
  * the shuffle carries only |partitions| × |groups| k-sized buffers and no
  * task ever sees more than that.
  *
  * Returns the group's `array<string>` of values with the k smallest
  * (key, value) pairs, ascending. Null keys/values are skipped.
  */
case class BoundedTopK(
    key: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuf] with ExpectsInputTypes {

  require(k > 0, s"bounded_topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(key, value)

  // declared input types let the analyzer coerce (int → bigint) or fail
  // with a clean error naming the function — update() casts unchecked
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, StringType)

  override def createAggregationBuffer(): TopKStrBuf = new TopKStrBuf(k)

  override def update(buf: TopKStrBuf, input: InternalRow): TopKStrBuf = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null) {
      // clone: the UTF8String may point into a reused row buffer
      buf.offer(kv.asInstanceOf[Long], vv.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(b1: TopKStrBuf, b2: TopKStrBuf): TopKStrBuf = b1.merge(b2)

  override def eval(buf: TopKStrBuf): Any =
    new GenericArrayData(buf.vals.take(buf.size).asInstanceOf[Array[Any]])

  override def serialize(buf: TopKStrBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeLong(buf.keys(i))
      val b = buf.vals(i).getBytes
      out.writeInt(b.length)
      out.write(b)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKStrBuf(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.keys(i) = in.readLong()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.vals(i) = UTF8String.fromBytes(b)
      i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bounded_topk"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(key = newChildren(0), value = newChildren(1))
}
