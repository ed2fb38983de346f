package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Data selection via importance resampling (DSIR — Xie et al., NeurIPS
  * 2023): score every raw-corpus document by how target-like its hashed
  * n-gram bag is, then keep the highest-importance slice. This is the
  * "select pre-training data that looks like the domain you care about"
  * step of a training-data pipeline, and it is deliberately cheap: no
  * model, no embeddings — two bucket-count aggregations and a
  * broadcast-joined scan.
  *
  * Features are word {1..maxN}-grams of the lower-cased text, hashed into
  * `16^hexChars` buckets by an md5 hex prefix. The md5 grain is the
  * engine-portability contract (any system reproduces the exact bucket
  * assignment — the [[graft.profile.Sampling.stratifiedHashSample]]
  * convention); the bucket space being FIXED (not data-dependent) is what
  * makes the estimator scale-free: the target and raw distributions are
  * each one narrow aggregation collapsing to at most 16^hexChars rows,
  * broadcast back over the corpus regardless of corpus size.
  *
  * Per-bucket log importance ratio, with add-alpha smoothing over the
  * fixed bucket space B = 16^hexChars:
  *
  *   lr_b = ln( (t_b + α)(R + αB) / ((r_b + α)(T + αB)) )
  *
  * and a document's weight is Σ lr_b over its gram occurrences (with
  * multiplicity), rounded to 4 dp — the log importance weight of the
  * whole document under the bucketed unigram/bigram model. Documents
  * with no features (empty/blank) are restored at weight 0 (importance
  * 1), the [[Analysis.unigramLogProb]] convention.
  *
  * Scale shape: gram explode is scan-side; bucket counts are two narrow
  * aggs (≤ B rows each); the log-ratio table is a ≤ B-row broadcast; the
  * only data-sized shuffle is the per-doc weight aggregation on the id
  * key. Selection composes downstream as `ORDER BY weight DESC LIMIT k`
  * (plans as TakeOrdered — map-side partial top-k, never a global sort)
  * or as [[gumbelTopK]] for the paper's sampled variant.
  */
object Dsir {

  /** All word n-grams of sizes 1..maxN, with multiplicity. */
  private def grams(c: Column, maxN: Int): Column =
    concat((1 to maxN).map(n => TextFns.wordShingles(lower(c), n)): _*)

  /** md5 hex-prefix bucket of a gram: `hexChars` chars → 16^hexChars
    * buckets, identical in any engine with md5.
    */
  private def bucket(c: Column, hexChars: Int): Column =
    substring(md5(c), 1, hexChars)

  /** Per-document hashed-n-gram importance weights of `raw` against the
    * `target` corpus. Output: (id, n_feats, weight), one row per raw
    * document — weight = Σ lr_b rounded to 4 dp, n_feats = gram
    * occurrences scored.
    */
  def importanceWeights(
      raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      maxN: Int = 2, hexChars: Int = 3, alpha: Double = 1.0): DataFrame = {
    require(maxN >= 1, s"importanceWeights: maxN must be >= 1, got $maxN")
    require(hexChars >= 1 && hexChars <= 8,
      s"importanceWeights: hexChars must be in 1..8, got $hexChars")
    require(alpha > 0, s"importanceWeights: alpha must be > 0, got $alpha")
    val bCount = math.pow(16.0, hexChars)

    // (id, 3-hex-char) rows — narrow, and consumed TWICE (the bucket
    // count and the scoring join): lazy localCheckpoint so the gram
    // explode + md5 pass over the corpus runs once, not per consumer.
    // Par.balance: the shingle transform + per-gram md5 is CPU-bound, and
    // a small corpus arrives as one input partition — widen it (no-op at
    // real scale, where scans come pre-partitioned)
    val rawGrams = graft.util.Par.balance(raw)
      .select(col(idCol).cast("long").as("id"),
        explode(grams(coalesce(col(textCol), lit("")), maxN)).as("g"))
      .filter(col("g") =!= "")
      .select(col("id"), bucket(col("g"), hexChars).as("b"))
      .localCheckpoint(eager = false)
    val tgtGrams = graft.util.Par.balance(target).select(
        explode(grams(coalesce(col(targetTextCol), lit("")), maxN)).as("g"))
      .filter(col("g") =!= "")
      .select(bucket(col("g"), hexChars).as("b"))

    // ≤ B-row frames, each consumed twice (totals + the ratio table)
    val rb = rawGrams.groupBy("b").agg(count(lit(1)).as("rcnt"))
      .localCheckpoint(eager = false)
    val tb = tgtGrams.groupBy("b").agg(count(lit(1)).as("tcnt"))
      .localCheckpoint(eager = false)
    // totals as 1-row broadcast aggregates, snapshotting at the same
    // action as the bucket counts (the unigramLogProb `totals` pattern);
    // an empty target is legal (every bucket smooths to α/(αB)) but its
    // sum is NULL over zero rows — coalesce to 0
    val totals = rb.agg(sum("rcnt").as("rtot"))
      .crossJoin(tb.agg(coalesce(sum("tcnt"), lit(0L)).as("ttot")))
    // raw-side buckets only: every scored gram has rcnt >= 1 by
    // construction, so the left join covers the whole scan
    val lr = rb.join(tb, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        log((coalesce(col("tcnt"), lit(0L)) + alpha) *
            (col("rtot") + alpha * bCount) /
            ((col("rcnt") + alpha) *
             (col("ttot") + alpha * bCount))).as("lr"))

    // one row per scored document, consumed twice (output + the
    // zero-feature restore's anti-join)
    val scored = rawGrams.join(broadcast(lr), "b")
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"), round(sum("lr"), 4).as("weight"))
      .localCheckpoint(eager = false)
    scored.unionByName(
      raw.select(col(idCol).cast("long").as("id"))
        .join(scored.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(0L).as("n_feats"), lit(0.0).as("weight")))
  }

  /** The paper's sampled selection: Gumbel-top-k over the importance
    * weights — add an i.i.d. Gumbel(0,1) perturbation to each weight and
    * take the k largest, which draws k documents WITHOUT replacement with
    * probability ∝ exp(weight). The Gumbel noise is a pure seeded hash of
    * the id (u from the first 6 md5 hex digits, g = −ln(−ln(u))), so the
    * draw is deterministic per (input, seed) and shuffle-free; the top-k
    * itself plans as TakeOrdered. Ties (measure-zero) break by id.
    */
  def gumbelTopK(weights: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, s"gumbelTopK: k must be > 0, got $k")
    // u in (0,1) open: (h + 0.5) / 16^6 with h in [0, 16^6)
    val u = (conv(substring(md5(concat(lit(seed.toString), lit(":"),
        col(idCol).cast("string"))), 1, 6), 16, 10).cast("long") + 0.5) /
      lit(16777216.0)
    weights
      .withColumn("__key", col(weightCol) - log(-log(u)))
      .orderBy(desc("__key"), col(idCol))
      .limit(k)
      .drop("__key")
  }
}
