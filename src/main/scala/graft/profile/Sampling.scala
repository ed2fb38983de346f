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

  /** Deterministic stratified corpus re-sampling — the "data mixing" step
    * of a training pipeline (down-weight an over-represented source or
    * language to a target rate). Membership is a pure per-row hash
    * decision: keep a row iff the first 4 hex digits of
    * `md5(stratum ‖ ":" ‖ id)` fall below the stratum's rate threshold —
    * so the operator is a scan-side filter with NO shuffle, NO window and
    * NO per-stratum state, the same plan shape at 1 GB and 100 TB, and
    * membership is stable across runs, partitionings, and engines (any
    * system with md5 reproduces the exact row set — hex-digit strings
    * compare lexicographically as numbers).
    *
    * Rate granularity is 1/65536; rates ≥ 1 keep everything. Sampling is
    * binomial per stratum (each row an independent hash coin), not
    * exact-count — the price of the shuffle-free plan, and the standard
    * trade at corpus scale where exact counts would need a global sort.
    */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0), "negative rate")
    def keepExpr(rate: Double) = {
      val threshold = (rate * 65536).round.toInt
      // a rate just under 1.0 can round UP to 65536, whose hex rendering
      // is 5 chars — lexicographically BELOW almost every 4-char prefix,
      // which would silently drop ~94% of a stratum meant to keep ~100%
      if (rate >= 1.0 || threshold >= 65536) lit(true)
      // null-keyed rows must SAMPLE (at their branch's rate), not vanish:
      // md5(concat(NULL, …)) is NULL, the comparison is NULL, and filter()
      // would silently reject every null-stratum / null-id row. A null
      // stratum falls through the when-chain to this defaultRate branch;
      // the coalesces give it a stable hash key instead of a NULL verdict.
      else substring(
        md5(concat(coalesce(col(strataCol), lit("")), lit(":"),
          coalesce(col(idCol).cast("string"), lit("")))),
        1, 4) < lit(f"$threshold%04x")
    }
    val keep = rates.toSeq.sortBy(_._1).foldRight(keepExpr(defaultRate)) {
      case ((stratum, rate), acc) =>
        when(col(strataCol) === stratum, keepExpr(rate)).otherwise(acc)
    }
    df.filter(keep)
  }
}
