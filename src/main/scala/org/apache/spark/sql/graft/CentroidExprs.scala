/* Hosted in org.apache.spark.sql (see GraftExprs.scala). */
package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, IntegerType, LongType}

/** The assign/probe contract the centroid expressions compile against —
  * implemented by the exact linear-scan [[CentroidKernel]] and the
  * [[TwoLevelCentroidKernel]] sublinear form.
  */
trait CentroidIndex extends Serializable {
  def nearestOne(v: ArrayData): Int
  def nearestN(v: ArrayData, n: Int): ArrayData

  /** Squared L2 to the nearest centroid (under this index's probe rule) —
    * the per-row term of the k-means quantization cost.
    */
  def nearestOneDist(v: ArrayData): Double

  /** Destroy the backing broadcast(s). DRIVER-side, and only once every
    * job using this kernel has completed — the hook that lets an
    * iterative trainer (one kernel per Lloyd iteration, [[graft.knn
    * .KMeans.lloyd]]) release each iteration's codebook copies eagerly
    * instead of accumulating them until the ContextCleaner's GC-driven
    * sweep, without reaching inside the kernel abstraction.
    */
  def release(): Unit

  /** Squared L2 of a codebook row against an input vector — min-clamped
    * (the engine-wide short-dimension convention), float subtraction in
    * double accumulation. ONE definition shared by both kernels so the
    * distance rule cannot drift between the exact and two-level paths.
    */
  protected final def distTo(c: Array[Float], v: ArrayData): Double = {
    val m = math.min(c.length, v.numElements())
    var d = 0.0
    var i = 0
    while (i < m) { val x = v.getFloat(i) - c(i); d += x * x; i += 1 }
    d
  }
}

/** Shared nearest-centroid kernel for the IVF assign/probe expressions.
  *
  * Holds the coarse-quantizer matrix as a Spark `Broadcast` — the
  * expression serializes as a broadcast handle (bytes, not the matrix), so
  * a large codebook (e.g. 65k × 768-d ≈ 200 MB at IVF-64k scale) ships to
  * each executor once via the torrent protocol instead of riding every
  * serialized task binary. Distance arithmetic is bit-identical to the
  * replaced Scala UDFs (float subtraction in double accumulation, short
  * dimension wins), but reads primitives straight off `ArrayData` —
  * no per-row `Seq[Float]` conversion, no boxing, and the call stays
  * inside the whole-stage-codegen span.
  */
final class CentroidKernel(bc: Broadcast[Array[Array[Float]]]) extends CentroidIndex {

  @transient private lazy val cs: Array[Array[Float]] = bc.value

  /** Index of the nearest centroid; ties keep the lowest index. */
  def nearestOne(v: ArrayData): Int = {
    val local = cs
    var best = 0
    var bestD = Double.MaxValue
    var ci = 0
    while (ci < local.length) {
      val d = distTo(local(ci), v)
      if (d < bestD) { bestD = d; best = ci }
      ci += 1
    }
    best
  }

  def nearestOneDist(v: ArrayData): Double = {
    val local = cs
    var bestD = Double.MaxValue
    var ci = 0
    while (ci < local.length) {
      val d = distTo(local(ci), v)
      if (d < bestD) bestD = d
      ci += 1
    }
    bestD
  }

  /** The `n` nearest centroid indices ordered by (distance, index) — the
    * same lexicographic contract as sorting all (dist, idx) pairs.
    */
  def nearestN(v: ArrayData, n: Int): ArrayData = {
    val local = cs
    val cap = math.min(n, local.length)
    // n <= 0 (an unvalidated nProbe reaching the kernel): empty probe
    // list, not ds(-1) — the public APIs require positive probes, this
    // is the defense behind them
    if (cap <= 0) return new GenericArrayData(Array.emptyIntArray)
    val ds = new Array[Double](cap)
    val ids = new Array[Int](cap)
    var size = 0
    var ci = 0
    while (ci < local.length) {
      val d = distTo(local(ci), v)
      if (size < cap || d < ds(cap - 1)) {
        var p = if (size < cap) size else cap - 1
        while (p > 0 && (ds(p - 1) > d || (ds(p - 1) == d && ids(p - 1) > ci))) {
          ds(p) = ds(p - 1); ids(p) = ids(p - 1); p -= 1
        }
        ds(p) = d; ids(p) = ci
        if (size < cap) size += 1
      }
      ci += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(ids, size))
  }

  def release(): Unit = bc.destroy()
}

/** Sublinear two-level assign over a large codebook: the k fine centroids
  * are themselves clustered into ~√k coarse cells (driver-side, codebook-
  * sized — never data-sized); an assign scans the `probes` nearest coarse
  * cells' fine members only, O(√k·(1+probes)·dim) per row instead of
  * O(k·dim) — the difference between a 10⁵-list IVF build being linear
  * or quadratic-feeling in the list count.
  *
  * Approximate at cell boundaries: a vector may land in a near-optimal
  * list instead of the optimal one. That shifts LIST MEMBERSHIP, not
  * search correctness — IVF search is exact within probed lists, and the
  * list IS defined by whatever assign built it (FAISS's coarse assign has
  * the same contract). With `probes` = the coarse cell count the scan is
  * exhaustive and equals the exact kernel on tie-free inputs.
  *
  * `cellOf`/`members` are built once on the driver and broadcast; fine
  * ids within a cell are ascending, so ties inside one cell keep the
  * lowest index (cross-cell ties follow probe order — documented
  * deviation from the exact kernel's global lowest-index rule).
  */
final class TwoLevelCentroidKernel(
    bcFine: Broadcast[Array[Array[Float]]],
    bcCoarse: Broadcast[Array[Array[Float]]],
    bcMembers: Broadcast[Array[Array[Int]]],
    probes: Int) extends CentroidIndex {

  @transient private lazy val fine: Array[Array[Float]] = bcFine.value
  @transient private lazy val coarse: Array[Array[Float]] = bcCoarse.value
  @transient private lazy val members: Array[Array[Int]] = bcMembers.value

  /** The `probes` nearest coarse cells, ordered by (dist, index). The
    * equal-distance/lower-index entry clause can never fire in this
    * ascending scan (a tying `ci` is always greater than the held index)
    * but is kept so the insert condition IS the (dist, index) contract,
    * matching [[nearestN]]'s arbitrary-order form verbatim.
    */
  private def probeCells(v: ArrayData): Array[Int] = {
    val cap = math.min(probes, coarse.length)
    if (cap <= 0) return Array.emptyIntArray
    val ds = new Array[Double](cap)
    val ids = new Array[Int](cap)
    var size = 0
    var ci = 0
    while (ci < coarse.length) {
      val d = distTo(coarse(ci), v)
      if (size < cap || d < ds(cap - 1) ||
        (d == ds(cap - 1) && ci < ids(cap - 1))) {
        var p = if (size < cap) size else cap - 1
        while (p > 0 && (ds(p - 1) > d || (ds(p - 1) == d && ids(p - 1) > ci))) {
          ds(p) = ds(p - 1); ids(p) = ids(p - 1); p -= 1
        }
        ds(p) = d; ids(p) = ci
        if (size < cap) size += 1
      }
      ci += 1
    }
    java.util.Arrays.copyOf(ids, size)
  }

  def nearestOne(v: ArrayData): Int = {
    val cells = probeCells(v)
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < cells.length) {
      val ms = members(cells(c))
      var i = 0
      while (i < ms.length) {
        val fi = ms(i)
        val d = distTo(fine(fi), v)
        if (d < bestD) { bestD = d; best = fi }
        i += 1
      }
      c += 1
    }
    // empty probed cells (possible when fine clusters collapse): fall
    // back to cell 0's members' closest... cannot happen with non-empty
    // members by construction; guard anyway with a full scan
    if (best >= 0) best
    else {
      var fi = 0
      var b = 0
      var bd = Double.MaxValue
      while (fi < fine.length) {
        val d = distTo(fine(fi), v)
        if (d < bd) { bd = d; b = fi }
        fi += 1
      }
      b
    }
  }

  def nearestOneDist(v: ArrayData): Double = {
    val fi = nearestOne(v)
    distTo(fine(fi), v)
  }

  def nearestN(v: ArrayData, n: Int): ArrayData = {
    val cells = probeCells(v)
    val cap = math.min(n, fine.length)
    if (cap <= 0) return new GenericArrayData(Array.emptyIntArray)
    val ds = new Array[Double](cap)
    val ids = new Array[Int](cap)
    var size = 0
    def insert(fi: Int): Unit = {
      val d = distTo(fine(fi), v)
      if (size < cap || d < ds(cap - 1) ||
        (d == ds(cap - 1) && fi < ids(cap - 1))) {
        var p = if (size < cap) size else cap - 1
        while (p > 0 && (ds(p - 1) > d || (ds(p - 1) == d && ids(p - 1) > fi))) {
          ds(p) = ds(p - 1); ids(p) = ids(p - 1); p -= 1
        }
        ds(p) = d; ids(p) = fi
        if (size < cap) size += 1
      }
    }
    var c = 0
    while (c < cells.length) {
      val ms = members(cells(c))
      var i = 0
      while (i < ms.length) { insert(ms(i)); i += 1 }
      c += 1
    }
    if (size == 0) {
      // every probed cell empty (collapsed fine clusters) — full-scan
      // fallback, the nearestOne contract; silently returning an empty
      // array would make the downstream explode drop the query row and
      // that query would report zero neighbors
      var fi = 0
      while (fi < fine.length) { insert(fi); fi += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(ids, size))
  }

  def release(): Unit = { bcFine.destroy(); bcCoarse.destroy(); bcMembers.destroy() }
}

/** IVF assign: nearest centroid index for a float vector. Replaces the
  * per-row Scala UDF (boxed Seq[Float], interpreted, codegen barrier) that
  * previously sat on the one code path that touches EVERY row at build
  * time (knn/IvfIndex build + ApproxKnn.ivfKnn assign).
  */
case class NearestCentroid(child: Expression, kernel: CentroidIndex)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any =
    kernel.nearestOne(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidKernel", kernel,
      classOf[CentroidIndex].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.nearestOne($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Squared L2 to the nearest centroid — the per-row quantization-cost
  * term ([[graft.knn.KMeans.cost]]); same broadcast-codebook shipping as
  * the assign expressions.
  */
case class NearestCentroidDist(child: Expression, kernel: CentroidIndex)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "nearest_centroid_dist"

  override def nullSafeEval(input: Any): Any =
    kernel.nearestOneDist(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidKernel", kernel,
      classOf[CentroidIndex].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.nearestOneDist($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidDist =
    copy(child = newChild)
}

/** IVF probe: the `n` nearest centroid indices, ordered by (dist, index).
  * Output is `array<int>` with non-null elements, matching the replaced
  * UDF's schema.
  */
case class NearestCentroids(child: Expression, kernel: CentroidIndex, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def nullSafeEval(input: Any): Any =
    kernel.nearestN(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidKernel", kernel,
      classOf[CentroidIndex].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.nearestN($arr, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** Random-hyperplane LSH signature kernel. The plane tensor is tiny
  * (tables × bits × dim floats) and immutable, so it rides the task-binary
  * broadcast directly — no explicit Broadcast needed. Signature arithmetic
  * is bit-identical to the replaced UDF (float multiply accumulated in
  * double, sign test at ≥ 0).
  */
final class LshKernel(planes: Array[Array[Array[Float]]]) extends Serializable {

  private val tables = planes.length
  private val bits = if (tables == 0) 0 else planes(0).length
  require(bits <= 48, s"LshKernel: bits=$bits exceeds the 48-bit signature budget")

  /** Buckets as combined `(table << 48) | signature` longs — table and
    * signature were only ever used together as a compound equi-join key,
    * so one long key halves the join-key width. With `probe` each table
    * additionally emits every signature at Hamming distance 1 (classic
    * multi-probe on the query side).
    */
  def buckets(v: ArrayData, probe: Boolean): ArrayData = {
    val out = new Array[Long](if (probe) tables * (bits + 1) else tables)
    var o = 0
    var t = 0
    while (t < tables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val p = planes(t)(b)
        var dot = 0.0
        var i = 0
        val m = math.min(p.length, v.numElements())
        while (i < m) { dot += p(i) * v.getFloat(i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      val base = t.toLong << 48
      out(o) = base | sig; o += 1
      if (probe) {
        var fb = 0
        while (fb < bits) { out(o) = base | (sig ^ (1L << fb)); o += 1; fb += 1 }
      }
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** LSH bucket keys for a float vector: `array<long>` of combined
  * table/signature keys (see [[LshKernel.buckets]]). Replaces the hot
  * per-row signature UDF in the LSH candidate generation.
  */
case class LshBuckets(child: Expression, kernel: LshKernel, probe: Boolean)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def nullSafeEval(input: Any): Any =
    kernel.buckets(input.asInstanceOf[ArrayData], probe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshKernel", kernel, classOf[LshKernel].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.buckets($arr, $probe);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}
