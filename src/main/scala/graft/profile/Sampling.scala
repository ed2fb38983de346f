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

  /** Corpus mixture rebalancing — derive per-stratum keep rates so the
    * SURVIVING corpus realizes a target mixture (e.g. 40% en / 30% zh /
    * 30% de by rows, or by a mass column such as token counts), then
    * apply the [[stratifiedHashSample]] hash-coin rule. The output is the
    * LARGEST corpus achievable under the target: the scarcest stratum
    * relative to its share keeps everything (rate 1) and every other
    * stratum downsamples to match.
    *
    * Fully declarative — rates are a ≤|strata|-row broadcast derived by
    * two narrow aggregations, never a driver collect, so strata
    * cardinality is unbounded and plan construction runs no job. Rows
    * whose stratum is not in `targetShares` (including NULL strata) are
    * excluded by the inner join: the mixture DEFINES the output corpus.
    * A target stratum absent from the corpus simply contributes nothing
    * (the realized mixture then matches the target restricted to the
    * strata present — a data condition a declarative plan cannot throw
    * on, so it is the documented semantics).
    *
    * Membership parity: the same md5 hex-threshold rule as
    * [[stratifiedHashSample]], with the threshold rendered per-row via
    * `format_string("%04x")` — any engine with md5 + printf reproduces
    * the exact surviving row set. Rates at or above 1 (threshold 65536
    * renders 5 chars, lexicographically below most 4-char prefixes) take
    * the explicit keep-all branch.
    */
  def rebalanceToMixture(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      targetShares: Map[String, Double],
      massCol: Option[String] = None): DataFrame = {
    require(targetShares.nonEmpty, "rebalanceToMixture: empty target mixture")
    require(targetShares.values.forall(_ > 0),
      "rebalanceToMixture: shares must be > 0")
    val massExpr = massCol.map(c => sum(col(c)).cast("double"))
      .getOrElse(count(lit(1)).cast("double")).as("__mass")
    val mass = df.groupBy(col(strataCol).as("__stratum")).agg(massExpr)
    val shares = df.sparkSession
      .createDataFrame(targetShares.toSeq.sortBy(_._1))
      .toDF("__stratum", "__share")
    val joined = mass.join(shares, "__stratum")
    // the binding stratum: max feasible output mass M = min(mass/share)
    val scale = joined.agg(min(col("__mass") / col("__share")).as("__M"))
    val rates = joined.crossJoin(broadcast(scale))
      .select(col("__stratum"),
        (col("__share") * col("__M") / col("__mass")).as("__rate"))
    val threshold = round(col("__rate") * 65536).cast("int")
    val prefix = substring(
      md5(concat(coalesce(col(strataCol), lit("")), lit(":"),
        coalesce(col(idCol).cast("string"), lit("")))), 1, 4)
    df.join(broadcast(rates), df(strataCol) === col("__stratum"))
      .filter(col("__rate") >= 1.0 || threshold >= 65536 ||
        prefix < format_string("%04x", threshold))
      .drop("__stratum", "__rate")
  }
}
