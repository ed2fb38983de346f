package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling and selection operators (SURVEY.md §2.6 T3–T7). Sampled
  * MEMBERSHIP necessarily differs from the reference's pandas RNG; the
  * engine's contract is determinism within itself (same input + seed →
  * same sample), which every helper here satisfies.
  */
object Sampling {

  /** T3: head sample (`df.head(n)` — extract_schema.py:45). */
  def headRows(df: DataFrame, n: Int): DataFrame = df.limit(n)

  /** T4: seeded random row sample of exactly min(n, count) rows
    * (`df.sample(n=min(len,10), random_state=42)` —
    * semantic_annotation.py:66).
    */
  def seededSample(df: DataFrame, n: Int, seed: Int = 42): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** T7: seeded shuffle (pairsBuilder.py:142–145). */
  def seededShuffle(df: DataFrame, seed: Int = 42): DataFrame =
    df.orderBy(rand(seed))

  /** T6: test-space selection — GT rows from `splitRow` on (the
    * `iloc[split_number:]` tail, semantic_annotation.py:140–147), then the
    * distinct union of both table-name sides (P2).
    *
    * The unpartitioned ranking window is deliberate and safe here: the
    * input is the ground-truth RELATION (catalog metadata, thousands of
    * rows at most), never a data-sized frame.
    */
  def testSpaceTables(gt: DataFrame, qTableCol: String, cTableCol: String,
      splitRow: Long): DataFrame = {
    val ordered = gt.withColumn("__rn",
      row_number().over(Window.orderBy(gt.columns.map(col): _*)))
    val tail = ordered.filter(col("__rn") > splitRow)
    tail.select(col(qTableCol).as("table"))
      .union(tail.select(col(cTableCol).as("table")))
      .distinct()
  }
}
