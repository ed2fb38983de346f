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

  /** `numHashes` permutations approximated by seeded MurmurHash3 over
    * word shingles; deterministic across JVMs.
    */
  def sig(text: UTF8String): ArrayData = {
    val sig = Array.fill(numHashes)(Int.MaxValue)
    if (text != null) {
      val toks = text.toString.trim.toLowerCase.split("\\s+")
      var i = 0
      while (i + shingleSize <= toks.length) {
        val sh = toks.slice(i, i + shingleSize).mkString(" ")
        var h = 0
        while (h < numHashes) {
          val v = MurmurHash3.stringHash(sh, h * 0x9e3779b9 + 1)
          if (v < sig(h)) sig(h) = v
          h += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }
}

final class SimHashKernel extends Serializable {

  /** 64-bit SimHash over whitespace tokens (deterministic). */
  def hash(text: UTF8String): Long = {
    val acc = new Array[Int](64)
    if (text != null) {
      text.toString.trim.toLowerCase.split("\\s+").foreach { t =>
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
