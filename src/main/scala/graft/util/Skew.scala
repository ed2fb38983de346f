package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join (SURVEY.md scale posture): salted equi-join for a
  * hot-key-skewed big side. The skewed side gets a uniform random salt in
  * [0, salt); the other side is replicated `salt` times (explode over the
  * salt range); the join key becomes (key, salt), splitting each hot key's
  * rows across `salt` reducers.
  *
  * AQE's skew-join split handles most cases automatically at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting remains the
  * tool for deterministic layouts (bucketed outputs) and for aggregations
  * where AQE cannot split (hot groupBy keys → two-phase: salt + partial
  * agg, then final agg on the bare key).
  */
object Skew {

  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // right/full outer would emit `salt` null-padded duplicates for every
    // unmatched `other` row (it is exploded salt times) — silently wrong
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    val left = skewed.withColumn("__salt",
      (rand(42) * salt).cast("int"))
    val right = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    left.join(right, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for hot groupBy keys: partial aggregate on
    * (key, salt), final aggregate on key. Caller supplies associative
    * partial/final agg pairs expressed on the named value column.
    */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      valueCol: String,
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    df.withColumn("__salt", (rand(42) * salt).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as("sum_value"))
  }
}
