/* Hosted in org.apache.spark.sql (see GraftExprs.scala). */
package org.apache.spark.sql.graft

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash/SimHash signature kernels — the last two interpreted
  * per-row Scala UDFs on an every-document path (the dedup signature
  * build), ported to the kernel-expression pattern of
  * [[CentroidKernel]]/[[LshKernel]]: the expression ships the tiny
  * parameter object, evaluation runs inside the whole-stage-codegen span
  * (no Row boxing, no codegen barrier), and the arithmetic is
  * bit-identical to the replaced UDFs (same trim/lower/split pipeline,
  * same seeded MurmurHash3 calls) so signatures — and therefore LSH
  * banding and blocked-join outputs — are unchanged.
  *
  * Null contract (also UDF-identical): a null document yields the EMPTY
  * signature (all-sentinel MinHash / zero SimHash), not null — the
  * expressions are non-nullable, like the Scala closures they replace.
  */
final class MinHashKernel(val shingleSize: Int, val numHashes: Int)
  extends Serializable {
  require(shingleSize > 0,
    s"MinHashKernel: shingleSize must be positive, got $shingleSize")
  require(numHashes > 0,
    s"MinHashKernel: numHashes must be positive, got $numHashes")

  /** `numHashes` permutations approximated by seeded MurmurHash3 over
    * word shingles; deterministic across JVMs.
    *
    * A non-blank document SHORTER than `shingleSize` hashes its whole
    * token sequence as one shingle: with no shingle at all every short
    * doc would emit the identical all-sentinel signature, every band
    * would collide, and ALL short docs would read as mutual exact
    * duplicates (est 1.0) — a wrong answer plus a quadratic pair blowup.
    * Blank/whitespace-only text has no tokens (the `""` that split
    * yields is not a token — the TermFreqKernel rule) and keeps the
    * all-sentinel empty-document signature, like null.
    */
  def sig(text: UTF8String): ArrayData = {
    val sig = Array.fill(numHashes)(Int.MaxValue)
    if (text != null) {
      // UTF8String.toLowerCase = the function SQL lower() calls — the
      // one lowering every tokenizing kernel shares (TermFreqKernel doc)
      val toks = text.toLowerCase.toString.trim.split("\\s+")
        .filter(_.nonEmpty)
      def hashShingle(sh: String): Unit = {
        var h = 0
        while (h < numHashes) {
          val v = MurmurHash3.stringHash(sh, h * 0x9e3779b9 + 1)
          if (v < sig(h)) sig(h) = v
          h += 1
        }
      }
      if (toks.nonEmpty && toks.length < shingleSize)
        hashShingle(toks.mkString(" "))
      else {
        var i = 0
        while (i + shingleSize <= toks.length) {
          hashShingle(toks.slice(i, i + shingleSize).mkString(" "))
          i += 1
        }
      }
    }
    new GenericArrayData(sig)
  }
}

final class SimHashKernel extends Serializable {

  /** 64-bit SimHash over whitespace tokens (deterministic). Blank text
    * has no tokens and hashes to 0 like null — the phantom `""` token
    * split yields would otherwise give blank and null documents
    * DIFFERENT signatures for identical normalized content.
    */
  def hash(text: UTF8String): Long = {
    val acc = new Array[Int](64)
    if (text != null) {
      text.toLowerCase.toString.trim.split("\\s+")
        .iterator.filter(_.nonEmpty).foreach { t =>
        val h = (MurmurHash3.stringHash(t, 7).toLong << 32) |
          (MurmurHash3.stringHash(t, 13).toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Shared shape for the signature expressions: string in, non-nullable
  * signature out, null input forwarded to the kernel (NOT null-propagated
  * — the UDF contract these replace).
  */
abstract class SignatureExpression extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false

  protected def evalKernel(text: UTF8String): Any
  /** `(kernelRef, inputExpr) => java expr` for the generated call. */
  protected def kernelRefCall(ctx: CodegenContext): String => String

  override def eval(input: InternalRow): Any =
    evalKernel(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val call = kernelRefCall(ctx)(
      s"${c.isNull} ? null : (${classOf[UTF8String].getName}) ${c.value}")
    ev.copy(
      code = code"""
        ${c.code}
        ${CodeGenerator.javaType(dataType)} ${ev.value} = $call;""",
      isNull = FalseLiteral)
  }
}

/** Winnowing fingerprint kernel (Schleimer/Wilkerson/Aiken — the MOSS
  * local fingerprinting algorithm) with a TRUE rolling hash: polynomial
  * 64-bit char hash updated in O(1) per gram, window minima via a
  * monotonic deque — O(n) per document end to end (the Column-HOF
  * formulation is O(n²): `UTF8String.substring` seeks char boundaries
  * linearly and lambda bodies are excluded from codegen CSE).
  * Guarantee (any hash): two documents sharing a substring of
  * ≥ `w + k - 1` chars share ≥ 1 fingerprint.
  */
final class WinnowKernel(val k: Int, val w: Int) extends Serializable {
  require(k >= 2 && w >= 1, s"WinnowKernel: k=$k w=$w out of range")

  private val B = 0x100000001b3L // FNV-1a prime as the polynomial base
  private val powK1 = { // B^(k-1) for the rolling drop term
    var p = 1L; var i = 0
    while (i < k - 1) { p *= B; i += 1 }
    p
  }

  private def fullHash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * B; i += 1 }
    h
  }

  /** Sorted distinct window minima of the rolling k-gram hashes; texts
    * shorter than `k` yield the whole-text hash.
    */
  def fingerprints(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array(fullHash(s)))
    val nGrams = n - (k - 1)
    // rolling polynomial hash per gram
    val hashes = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = h
    var g = 1
    while (g < nGrams) {
      h = (h - s.charAt(g - 1) * powK1) * B + s.charAt(g + k - 1)
      hashes(g) = h
      g += 1
    }
    // sliding-window minima (monotonic deque of candidate indices); a
    // window min is emitted once j reaches each window's end — for
    // nGrams < w that is the single all-grams window at j = nGrams - 1
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // deque content: indices in [head, tail)
    val out = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j < nGrams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(j)) tail -= 1
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= math.min(w, nGrams) - 1) out.add(hashes(deque(head)))
      j += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next(); o += 1 }
    new GenericArrayData(arr)
  }
}

/** Winnowing fingerprints of a document: sorted-distinct `array<long>`. */
case class WinnowFingerprints(child: Expression, kernel: WinnowKernel)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    kernel.fingerprints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowKernel", kernel,
      classOf[WinnowKernel].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.fingerprints($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** MinHash signature: `array<int>` of `numHashes` minima. */
case class MinHashSig(child: Expression, kernel: MinHashKernel)
  extends SignatureExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def evalKernel(text: UTF8String): Any = kernel.sig(text)
  override protected def kernelRefCall(ctx: CodegenContext): String => String = {
    val ref = ctx.addReferenceObj("minHashKernel", kernel,
      classOf[MinHashKernel].getName)
    in => s"$ref.sig($in)"
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a document. */
case class SimHash64(child: Expression, kernel: SimHashKernel = new SimHashKernel)
  extends SignatureExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def evalKernel(text: UTF8String): Any = kernel.hash(text)
  override protected def kernelRefCall(ctx: CodegenContext): String => String = {
    val ref = ctx.addReferenceObj("simHashKernel", kernel,
      classOf[SimHashKernel].getName)
    in => s"$ref.hash($in)"
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
