package graft.knn

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE recall-vs-brute-force evaluator shared by the drift harnesses
  * ([[HnswDrift]], [[IvfPqDrift]]) — the approx frame is whatever the
  * family under test returned; truth is exact kNN over the stage's
  * corpus, and the denominator is the ACTUAL truth size (a corpus
  * holding fewer than k (+self) vectors gives exact kNN fewer than k
  * rows per query, and a fixed `queries·k` denominator would deflate
  * recall on a small tier even for a perfect index).
  */
private[graft] object RecallEval {

  /** NOTE the hard contract (since r17): the evaluator REFUSES a query
    * set whose distinct-id count × k exceeds [[recallVsExact]]'s 5M-row
    * driver bound, instead of gambling the driver heap — a caller that
    * used to hand a corpus-sized query frame now fails loudly and must
    * sample. Costs one extra distinct-count Spark job per evaluation —
    * acceptable for a probe/spec harness (the bound is checked on the
    * CHEAP side; counting the approx frame would re-run the expensive
    * search a caller has not checkpointed).
    */
  def recallVsExact(approx: DataFrame, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): Double = {
    import org.apache.spark.sql.functions.col
    // both result sets collect to the driver — sanctioned for a
    // probe/spec harness because each is bounded by distinct-queries·k
    // rows of two longs: 5M rows ≈ 80 MB — far past any probe's
    // ~500-query sample, far below driver heap. DISTINCT ids, matching
    // what the exact side below actually groups and collects —
    // duplicate query rows must not fail a set that fits
    val maxRows = 5000000L
    val bound = queries.select(col(idCol)).distinct().count() * math.max(k, 1)
    require(bound <= maxRows,
      s"RecallEval.recallVsExact: queries*k = $bound rows (> $maxRows) " +
        "— this evaluator collects to the driver and is meant for " +
        "sampled probe/spec query sets, not full-corpus runs")
    val got = approx
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = KnnJoin.broadcastKnn(queries, corpus, idCol, vecCol, k)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hits = exact.map { case (q, t) =>
      got.get(q).map(a => (a intersect t).size).getOrElse(0)
    }.sum
    val truthSize = exact.map(_._2.size).sum
    if (truthSize == 0) 1.0 else hits.toDouble / truthSize
  }
}

/** IVF-PQ ADC quality drift under distribution-shifted appends — the
  * measurement COVERAGE.md names as the PQ family's LIMIT ("ADC error
  * under drift; the answer is rebuild cadence"). The coarse centroids
  * and the PQ codebooks are trained at BUILD time over the base
  * distribution; appended vectors from a shifted distribution land in
  * whatever lists exist and quantize against codebooks that never saw
  * them, so ADC recall on drifted queries decays. The two recovery
  * stages the engine offers are measured in sequence:
  *
  *  - `rebalance` retrains the coarse centroids over the full persisted
  *    corpus and re-codes every residual against them — but keeps the
  *    build-time CODEBOOKS (rebalance stages `centroids/params/
  *    assignments`, never `pq/` — IvfIndex.rebalance). MEASURED: this
  *    is not a CODEBOOK recovery — the re-coded residual
  *    distribution (relative to the NEW centroids) mismatches codebooks
  *    trained on the old one, and full-probe recall can land BELOW the
  *    drifted trough (IvfPqDriftSpec: 0.88 after rebalance vs 0.97
  *    drifted). Regime-dependent: when the drifted vectors sit FAR
  *    from every build-time centroid their residuals blow out of the
  *    codebooks' operating range, and THAT rebalance does fix — fresh
  *    centroids shrink the residuals back to codebook scale
  *    (SCALE_r18_ivfpq_staleness, 20k tier: full-probe 0.24 drifted →
  *    0.716 after rebalance ≈ build 0.719). What it can never fix is
  *    codebook-SHAPE error — residuals of ordinary magnitude whose
  *    distribution no longer matches the trained codebooks (the spec
  *    fixture's regime above);
  *  - `rebuild` (a fresh [[IvfIndex.build]] over everything) retrains
  *    centroids AND codebooks — the actual recovery, at full-build cost.
  *    "Rebuild cadence" is therefore the operational answer COVERAGE.md
  *    names, with this harness measuring when the cadence is due.
  *
  * Shared-shape contract with [[HnswDrift]]: stage thunks run right
  * before their measurement, every stage measures recall@k across the
  * probe widths via the ONE [[RecallEval]], and the spec floor and the
  * scale probe (`ivfpqdrift`) drive this same mix so they cannot
  * measure different things.
  */
private[graft] object IvfPqDrift {

  /** recall@k of the persisted IVF-PQ index at `dir` (ADC scan with
    * exact re-rank, `usePq = true`) vs exact kNN over `corpus`.
    */
  def recallAt(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, nProbe: Int, corpus: DataFrame,
      k: Int = 10, rerank: Int = 4): Double =
    RecallEval.recallVsExact(
      IvfIndex.search(spark, dir, queries, idCol, vecCol, k, nProbe,
        usePq = true, rerank = rerank),
      queries, corpus, idCol, vecCol, k)

  /** Build IVF-PQ over `base`, append the drifted batches `b1` then `b2`,
    * then run the two recovery stages (rebalance, rebuild), measuring
    * recall@k for every `nProbes` entry after every stage. Returns
    * (stage, nProbe -> recall) in mix order: build, append1, append2,
    * rebalance, rebuild.
    *
    * `onStage` fires once per stage AFTER its maintenance op ran and its
    * recall was measured, while the persisted index still holds that
    * stage's state — the hook the staleness-correlation probe uses to
    * read [[IvfIndex.staleness]] beside each measured recall (the curve
    * that pins the displacement alarm threshold) without forking the
    * mix.
    */
  def runMix(
      spark: SparkSession,
      dir: String,
      base: DataFrame, b1: DataFrame, b2: DataFrame,
      queries: DataFrame,
      idCol: String, vecCol: String,
      nList: Int, pqM: Int,
      nProbes: Seq[Int], k: Int = 10,
      onStage: String => Unit = _ => ()): Seq[(String, Map[Int, Double])] = {
    IvfIndex.build(base, idCol, vecCol, dir, nList = nList, pqM = pqM)
    val full = base.unionByName(b1).unionByName(b2)
    // thunks, NOT eager values — each stage's maintenance op must run
    // right before ITS measurement (the HnswDrift.runMix rule)
    val stages = Seq[(String, () => DataFrame)](
      "build" -> (() => base),
      "append1" -> (() => {
        IvfIndex.append(spark, dir, b1, idCol, vecCol)
        base.unionByName(b1) }),
      "append2" -> (() => {
        IvfIndex.append(spark, dir, b2, idCol, vecCol)
        full }),
      "rebalance" -> (() => {
        IvfIndex.rebalance(spark, dir); full }),
      "rebuild" -> (() => {
        IvfIndex.build(full, idCol, vecCol, dir, nList = nList, pqM = pqM)
        full }))
    stages.map { case (stage, act) =>
      val corpus = act().cache()
      val r = nProbes.map(p =>
        p -> recallAt(spark, dir, queries, idCol, vecCol, p, corpus, k)).toMap
      corpus.unpersist()
      onStage(stage)
      stage -> r
    }
  }
}
