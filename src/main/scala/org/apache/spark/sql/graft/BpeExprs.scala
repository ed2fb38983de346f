/* Hosted in org.apache.spark.sql (see GraftExprs.scala). */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BpeEngine

/** Codegen surface over [[graft.functions.BpeEngine]] (F8 token-exact —
  * GPT-2 merges.txt and .tiktoken/cl100k engines interchangeably):
  * the tokenizer rides the expression as a reference
  * object (merge table ~1 MB for a production 50k vocabulary — task
  * binary, not per-row state) and the call stays inside the whole-stage
  * span. Per-row work is one String materialization plus the memoized
  * per-pre-token merge loop.
  */
case class BpeTokenCount(child: Expression, tokenizer: BpeEngine)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    tokenizer.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokenizer", tokenizer,
      classOf[BpeEngine].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.countTokens($s.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

case class BpeTruncate(child: Expression, tokenizer: BpeEngine, maxTokens: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_truncate"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      tokenizer.truncate(input.asInstanceOf[UTF8String].toString, maxTokens))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokenizer", tokenizer,
      classOf[BpeEngine].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $ref.truncate($s.toString(), $maxTokens));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTruncate =
    copy(child = newChild)
}
