/* Hosted inside org.apache.spark.sql — see the packaging note in
 * GraftExprs.scala.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that declares itself non-deterministic.
  *
  * Wrapping an expensive projection alias in this barrier stops BOTH
  * optimizer moves that re-inline the aliased expression into every
  * consumer: `CollapseProject` only merges deterministic projections and
  * `PushDownPredicate` only substitutes deterministic aliases, so a filter
  * over the alias stays ABOVE the projection and evaluates the computed
  * attribute instead of recomputing its defining expression per predicate.
  *
  * Unlike a `rand()`-guard idiom, there is nothing here the optimizer can
  * constant-fold or range-analyze away (Spark 4 simplifies comparisons
  * against `Rand`'s known [0,1) range), and unlike `persist`/
  * `localCheckpoint` it costs nothing: codegen and interpreted eval both
  * emit the child unchanged. Exchanges are NOT a substitute —
  * deterministic filters push straight through RepartitionByExpression.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OptimizerBarrier =
    copy(child = newChild)
}
