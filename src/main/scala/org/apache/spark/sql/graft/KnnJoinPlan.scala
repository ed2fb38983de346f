/* Hosted in org.apache.spark.sql (see GraftExprs.scala): logical/physical
 * plan nodes need private[sql] surface (Dataset.ofRows, logicalPlan).
 */
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Whole-operator kNN join as a first-class plan node (SURVEY.md §7.3.3
  * phase 3): `KnnJoinPlan(queries, candidates, k, metric)` produces, for
  * every query row, its k nearest candidates with distance and rank.
  *
  * Child contract (enforced by the [[KnnJoinOp]] API wrapper): each child
  * outputs exactly (id: bigint, vec: array<float>).
  *
  * The physical operator broadcasts the query side, keeps bounded
  * per-query top-k accumulators per candidate partition, then merges
  * partials with ONE reduceByKey shuffle of k-sized buffers — the same
  * no-N²-shuffle execution as graft.knn.KnnJoin.broadcastKnn, but planned
  * by Catalyst so the operator composes inside larger plans.
  */
case class KnnJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    k: Int,
    metric: String,
    excludeSelf: Boolean,
    // output attrs live in the constructor: a `val` would mint fresh
    // ExprIds on every transform copy and break downstream references
    output: Seq[Attribute] = KnnJoinPlan.freshOutput()) extends BinaryNode {

  override lazy val resolved: Boolean = childrenResolved

  // the node GENERATES its output (not derived from child attrs) — without
  // this the analyzer's missing-attribute check rejects the plan
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet

  // the exec reads BOTH child columns positionally — without declared
  // references, column pruning would rewrite the children and break the
  // (id, vec) positional contract. Guarded: the TVF path constructs this
  // node over UNRESOLVED children, whose .output would throw.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (childrenResolved)
      org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
    else org.apache.spark.sql.catalyst.expressions.AttributeSet.empty

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): KnnJoinPlan =
    copy(left = newLeft, right = newRight)
}

object KnnJoinPlan {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("query_id", LongType, nullable = false)(),
    AttributeReference("neighbor_id", LongType, nullable = false)(),
    AttributeReference("dist", DoubleType, nullable = false)(),
    AttributeReference("rank", IntegerType, nullable = false)())
}

/** Serializable bounded top-k accumulator (sorted ascending by (dist, id)). */
final class TopKBuf(val k: Int) extends Serializable {
  val dists = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0
  def offer(d: Double, id: Long): Unit = {
    if (size < k || d < dists(size - 1) ||
      (d == dists(size - 1) && id < ids(size - 1))) {
      var pos = if (size < k) size else size - 1
      while (pos > 0 && (dists(pos - 1) > d ||
        (dists(pos - 1) == d && ids(pos - 1) > id))) {
        dists(pos) = dists(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
      }
      dists(pos) = d; ids(pos) = id
      if (size < k) size += 1
    }
  }
  def merge(o: TopKBuf): TopKBuf = {
    var i = 0
    while (i < o.size) { offer(o.dists(i), o.ids(i)); i += 1 }
    this
  }
}

case class KnnJoinExec(
    output: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan,
    k: Int,
    metric: String,
    excludeSelf: Boolean) extends BinaryExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val cosine = metric == "cosine"
    val kLocal = k
    val exclude = excludeSelf

    val queryRows: Array[(Long, Array[Float])] = left.executeCollect().map { r =>
      (r.getLong(0), r.getArray(1).toFloatArray())
    }
    val bc = sparkContext.broadcast(queryRows)

    val partials: RDD[(Long, TopKBuf)] = right.execute().mapPartitions { it =>
      val q = bc.value
      val n = q.length
      val norms = if (cosine) q.map(p => math.sqrt(dot(p._2, p._2))) else null
      val heaps = Array.fill(n)(new TopKBuf(kLocal))
      it.foreach { row =>
        val cid = row.getLong(0)
        val cvec = row.getArray(1).toFloatArray()
        val cNorm = if (cosine) math.sqrt(dot(cvec, cvec)) else 0.0
        var j = 0
        while (j < n) {
          if (!(exclude && q(j)._1 == cid)) {
            val d =
              if (cosine) {
                val den = norms(j) * cNorm
                if (den > 0) 1.0 - dot(q(j)._2, cvec) / den else 1.0
              } else l2sq(q(j)._2, cvec)
            heaps(j).offer(d, cid)
          }
          j += 1
        }
      }
      heaps.iterator.zipWithIndex
        .filter(_._1.size > 0)
        .map { case (h, qi) => (q(qi)._1, h) }
    }

    partials.reduceByKey(_.merge(_)).mapPartitions { it =>
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
      it.flatMap { case (qid, h) =>
        (0 until h.size).iterator.map { r =>
          row.update(0, qid)
          row.update(1, h.ids(r))
          row.update(2, h.dists(r))
          row.update(3, r + 1)
          proj(row).copy().asInstanceOf[InternalRow]
        }
      }
    }
  }

  private def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): KnnJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the physical operator.
  * Registered via graft.GraftExtensions or
  * `spark.experimental.extraStrategies`.
  */
object KnnJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: KnnJoinPlan =>
      KnnJoinExec(p.output, planLater(p.left), planLater(p.right),
        p.k, p.metric, p.excludeSelf) :: Nil
    case _ => Nil
  }
}

/** SQL table-valued-function surface over the plan node:
  *
  * {{{
  *   SELECT * FROM knn_join('queries_view', 'candidates_view',
  *                          'id_col', 'vec_col', k [, metric [, exclude_self]])
  * }}}
  *
  * The builder plants [[KnnJoinPlan]] over UNRESOLVED relations/attributes;
  * the analyzer resolves the views from the catalog and the (id, vec)
  * normalization projections exactly as it would for hand-written SQL.
  * Registered by graft.GraftFunctions.register via the session's
  * TableFunctionRegistry.
  */
object KnnJoinTvf {
  import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
  import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression, Literal}
  import org.apache.spark.sql.catalyst.plans.logical.Project

  /** Analysis-time argument errors surface as AnalysisException (the
    * class SQL frontends render with position/sqlState), never as raw
    * require/ClassCastException from builder internals.
    */
  private def fail(detail: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" -> s"knn_join: $detail"), None)

  private def asString(e: Expression, what: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case _ => fail(s"argument '$what' must be a non-null string literal, got $e")
  }

  private def asInt(e: Expression, what: String): Int = {
    if (!e.resolved || !e.foldable)
      fail(s"argument '$what' must be a foldable integer literal, got $e")
    e.eval() match {
      case n: Byte  => n.toInt
      case n: Short => n.toInt
      case n: Int   => n
      case n: Long if n.isValidInt => n.toInt
      case null  => fail(s"argument '$what' must not be NULL")
      case other => fail(s"argument '$what' must be an integer literal, " +
        s"got $other of type ${e.dataType.simpleString}")
    }
  }

  private def asBoolean(e: Expression, what: String): Boolean = {
    if (!e.resolved || !e.foldable)
      fail(s"argument '$what' must be a foldable boolean literal, got $e")
    if (e.dataType != org.apache.spark.sql.types.BooleanType)
      fail(s"argument '$what' must be a boolean literal, " +
        s"got type ${e.dataType.simpleString}")
    e.eval() match {
      case b: Boolean => b
      case _ => fail(s"argument '$what' must not be NULL")
    }
  }

  def builder(args: Seq[Expression]): LogicalPlan = {
    if (args.length < 5 || args.length > 7)
      fail("usage: knn_join(queries, candidates, id_col, vec_col, k[, metric[, exclude_self]])")
    val idCol = asString(args(2), "id_col")
    val vecCol = asString(args(3), "vec_col")
    val k = asInt(args(4), "k")
    val metric = if (args.length >= 6) asString(args(5), "metric") else "l2sq"
    val excludeSelf =
      if (args.length >= 7) asBoolean(args(6), "exclude_self") else true

    def child(tableArg: Expression, what: String): LogicalPlan = Project(Seq(
      Alias(Cast(UnresolvedAttribute.quoted(idCol), LongType), "id")(),
      Alias(Cast(UnresolvedAttribute.quoted(vecCol), ArrayType(FloatType)), "vec")()),
      UnresolvedRelation(asString(tableArg, what).split('.').toSeq))

    KnnJoinPlan(child(args(0), "queries"), child(args(1), "candidates"),
      k, metric, excludeSelf)
  }
}

/** Dataset-level API over the plan node. */
object KnnJoinOp {

  /** Normalizes both sides to the (id, vec) child contract and plans a
    * [[KnnJoinPlan]]. The session must have [[KnnJoinStrategy]] registered
    * (graft.GraftFunctions.register does this).
    */
  def knnJoin(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      metric: String = "l2sq",
      excludeSelf: Boolean = true): DataFrame = {
    def normalize(df: DataFrame) = df.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    val spark = candidates.sparkSession
    val plan = KnnJoinPlan(
      normalize(queries).queryExecution.analyzed,
      normalize(candidates).queryExecution.analyzed,
      k, metric, excludeSelf)
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  }
}
