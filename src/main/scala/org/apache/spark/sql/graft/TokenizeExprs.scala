/* Hosted in org.apache.spark.sql (see GraftExprs.scala). */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-row term-frequency kernel: tokenize (trim → lower →
  * whitespace split, the engine convention shared with
  * [[MinHashKernel]]/[[SimHashKernel]]), count into a hash map, emit
  * (term, tf) structs sorted by term bytes (binary order — matches SQL
  * `array_sort` on strings, so output files stay byte-deterministic).
  *
  * Exists because term frequency is DOCUMENT-LOCAL: the explode +
  * groupBy idiom pays a corpus-wide shuffle for a per-row count, and the
  * Column-HOF run-length formulation re-evaluates its captured
  * sorted-array subtree per lambda element (lambda bodies are excluded
  * from codegen CSE — the [[WinnowKernel]] O(n²) lesson). This kernel is
  * O(tokens) per document at any document size and runs inside the
  * whole-stage-codegen span.
  */
final class TermFreqKernel extends Serializable {

  /** (term, tf) structs, term-byte-sorted; null/blank → empty array. */
  def freqs(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    // lower on the UTF8String, not the Java String: UTF8String.toLowerCase
    // is the SAME function SQL `lower()` calls, so kernel terms are
    // parity-locked to the SQL tokenizer by construction on every input.
    // (Its ASCII fast path is additionally locale-independent — a bare
    // String.toLowerCase would map 'I' to dotless 'ı' under a tr_TR JVM
    // where lower() does not; non-ASCII strings take Spark's slow path,
    // which matches whatever lower() itself does on that JVM.)
    val toks = text.toLowerCase.toString.trim.split("\\s+")
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) counts.merge(t, 1L, (a, b) => a + b)
      i += 1
    }
    // sort (term, tf) ENTRIES so the emit loop never re-materializes a
    // Java String / re-hashes per term — this runs per document on the
    // build, append and probe hot paths
    val entries = new Array[(UTF8String, Long)](counts.size)
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      entries(o) = (UTF8String.fromString(e.getKey), e.getValue)
      o += 1
    }
    java.util.Arrays.sort(entries,
      (a: (UTF8String, Long), b: (UTF8String, Long)) => a._1.compareTo(b._1))
    val out = new Array[Any](entries.length)
    var j = 0
    while (j < entries.length) {
      out(j) = new GenericInternalRow(Array[Any](entries(j)._1, entries(j)._2))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document term frequencies: `array<struct<term string, tf long>>`,
  * term-byte-sorted, empty (never null) for null/blank documents.
  */
case class TermFreqs(child: Expression,
    kernel: TermFreqKernel = new TermFreqKernel)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "term_freqs"

  override def eval(input: InternalRow): Any =
    kernel.freqs(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termFreqKernel", kernel,
      classOf[TermFreqKernel].getName)
    val c = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    ev.copy(
      code = code"""
        ${c.code}
        ${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
          .javaType(dataType)} ${ev.value} =
          $ref.freqs(${c.isNull} ? null :
            (${classOf[UTF8String].getName}) ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TermFreqs =
    copy(child = newChild)
}
