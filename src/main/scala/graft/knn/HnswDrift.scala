package graft.knn

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE HNSW quality-drift harness — shared by the spec floor
  * (HnswIndexSpec) and the scale probe (ScaleProbe `drift`), so the two
  * can never silently measure different operational mixes. Recall is a
  * GRAPH property: the membership/lateness oracles (q96/q97/q98) pin
  * WHAT is in the index, not how well it searches, and the q49/q58
  * recall floors pin a build-then-search fixture only — this drives the
  * graph through the maintenance life an index actually lives (append,
  * vacuum, append, reshard, append) and measures recall@k vs brute
  * force after EVERY stage across beam widths.
  */
private[graft] object HnswDrift {

  /** recall@k of the persisted index at `dir` (beam `ef`) vs exact kNN
    * over `corpus`, for `queries`.
    */
  def recallAt(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, ef: Int, corpus: DataFrame,
      k: Int = 10): Double =
    // the ONE recall evaluator (shared with IvfPqDrift) — actual-truth-
    // size denominator, see RecallEval
    // efAutoScale = false: a recall-vs-ef measurement must run the ef
    // it records — the beam law scaling a "ef 32" stage to 64 would
    // mislabel every drift artifact
    RecallEval.recallVsExact(
      HnswIndex.search(spark, dir, queries, idCol, vecCol,
        k = k, efSearch = ef, efAutoScale = false),
      queries, corpus, idCol, vecCol, k)

  /** Build at `shards`, then run the canonical mix — append b1, vacuum,
    * append b2, reshard to `reshardTo`, append b3 — measuring recall@k
    * for every `efs` entry after every stage (each stage's corpus is
    * cached for its measurements and unpersisted after — six eagerly
    * retained corpus copies would skew the very timings a probe
    * reports). Returns (stage, ef -> recall) in mix order.
    */
  def runMix(
      spark: SparkSession,
      dir: String,
      base: DataFrame, b1: DataFrame, b2: DataFrame, b3: DataFrame,
      queries: DataFrame,
      idCol: String, vecCol: String,
      shards: Int, reshardTo: Int,
      efs: Seq[Int], k: Int = 10): Seq[(String, Map[Int, Double])] = {
    // efSearch pinned: every measurement below passes its own raw ef
    // with efAutoScale = false, so the persisted serving default is
    // never read — no reason to pay the untuned path's shape probe at
    // tier-scale drift runs
    HnswIndex.build(base, idCol, vecCol, dir, shards = shards,
      efSearch = HnswIndex.DefaultServeEf)
    // thunks, NOT eager values: each stage's maintenance op must run
    // right before ITS measurement, not all up front at Seq construction
    val stages = Seq[(String, () => DataFrame)](
      "build" -> (() => base),
      "append1" -> (() => {
        HnswIndex.append(spark, dir, b1, idCol, vecCol)
        base.unionByName(b1) }),
      "vacuum" -> (() => {
        HnswIndex.vacuum(spark, dir); base.unionByName(b1) }),
      "append2" -> (() => {
        HnswIndex.append(spark, dir, b2, idCol, vecCol)
        base.unionByName(b1).unionByName(b2) }),
      "reshard" -> (() => {
        HnswIndex.reshard(spark, dir, newShards = reshardTo)
        base.unionByName(b1).unionByName(b2) }),
      "append3" -> (() => {
        HnswIndex.append(spark, dir, b3, idCol, vecCol)
        base.unionByName(b1).unionByName(b2).unionByName(b3) }))
    stages.map { case (stage, act) =>
      val corpus = act().cache()
      val r = efs.map(ef =>
        ef -> recallAt(spark, dir, queries, idCol, vecCol, ef, corpus, k)).toMap
      corpus.unpersist()
      stage -> r
    }
  }
}
