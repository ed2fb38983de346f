package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance expressions over `array<float>` columns, built from
  * Spark's higher-order functions (SURVEY.md §2.8 F13). These are the
  * correctness oracles; the hot kNN path computes the same arithmetic over
  * primitive arrays in [[graft.knn.KnnJoin]].
  *
  * All arithmetic is double-precision over float inputs, accumulated in
  * index order — matches a sequential fold, so results are deterministic.
  */
object Dist {

  /** Squared L2 (FAISS IndexFlatL2 convention — stored squared, rooted only
    * at the joinability threshold; SemLink/join_discoverer.py:277–280, 318).
    */
  def squaredL2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0),
      (acc, v) => acc + v)

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine distance = 1 − cos-similarity; 1.0 when either norm is 0. */
  def cosineDistance(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, lit(1.0) - dot(a, b) / denom).otherwise(lit(1.0))
  }
}
