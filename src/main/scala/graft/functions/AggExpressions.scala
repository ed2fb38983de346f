package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{BoundedTopK, Interop, VectorSum}

/** Column API over the custom aggregate expressions (implementation in
  * org.apache.spark.sql.graft — see the packaging note there).
  */
object AggExpressions {

  /** Top-k values by `(key ASC, value ASC)` as a sorted `array<string>`,
    * with bounded per-partition state (map-side partial aggregation) —
    * the scalable replacement for a ranking-window + filter + collect.
    */
  def boundedTopK(key: Column, value: Column, k: Int): Column =
    Interop.column(
      BoundedTopK(Interop.expression(key), Interop.expression(value), k)
        .toAggregateExpression())

  /** Elementwise sum of `array<float>` vectors as `array<double>`, with
    * map-side partial aggregation (one dim-sized buffer per group per
    * partition rides the shuffle — the distributed-k-means accumulator).
    */
  def vectorSum(v: Column): Column =
    Interop.column(VectorSum(Interop.expression(v)).toAggregateExpression())
}
