package graft.knn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Catalog-shape diagnostic: RELATIVE CONTRAST, the distance-
  * concentration statistic that decides which column of the measured
  * shape × engine recall matrix applies to a catalog (README "Which ANN
  * engine will I get"; SCALE_r17_recall_200k* / SCALE_r18_recall_1m_*).
  * The engine's gate picks its beam by SIZE; the catalog's SHAPE decides
  * whether the default base beam holds (clustered: recall ≥ 0.99 under
  * the beam law at both measured tiers) or wants the measured doubled
  * base (fully spread: 0.8916 at 10⁶ under the law, 0.9578 at base
  * 128) — and nothing else in the engine told an operator which regime
  * their data is in.
  *
  * For each query in a seeded sample, relative contrast is the ratio
  * mean-distance / nearest-neighbor-distance (He et al.'s D_mean/D_min
  * form), with the MEAN estimated within the sample (distance
  * concentration makes a 256-pair mean track the catalog mean) and the
  * NEAREST NEIGHBOR taken against the FULL catalog — the structure the
  * statistic exists to detect lives in the near field, and a
  * within-sample nearest neighbor misses it entirely (measured: a
  * 2000-cluster catalog sampled at 256 puts the median query's true
  * cluster-mate outside the sample, and the within-sample form read
  * 1.24 on clustered and spread fixtures alike). Distance concentration
  * drives the ratio toward 1 on structureless (uniform) data — the
  * regime where every ANN's pruning signal fades — while clustered data
  * keeps a near neighbor much closer than the mean. The reported
  * statistic is the MEDIAN over sampled queries (robust to isolated
  * points and exact duplicates, whose per-query ratio is clamped).
  *
  * MEASURED anchors, committed in SCALE_r19_shape_*.json (the `shape`
  * ScaleProbe mode; 256-query sample, d = 64; supersedes the r18
  * artifacts under the exact-median fix — values moved only at the
  * 4th decimal) — the statistic is TIER-STABLE per shape, which is
  * what makes it usable as a classifier: the jittered-copy clustered
  * fixtures (the shape whose recall rows measure ≥ 0.99 under the
  * beam law) score median rc = 6.32 (q25 6.08) at 2·10⁴ keys and
  * 6.23 (q25 6.05) at 10⁶; the adversarial `embMode=spread` uniform
  * fixtures score 1.52 (q25 1.50) at 2·10⁵ and 1.56 (q25 1.53) at
  * 10⁶ (on uniform data rc drifts up only as N^(1/d) — negligibly);
  * the raw sf0.1 driver embeddings (2k random vectors —
  * spread-shaped by construction, and exact-tier by size anyway)
  * score 1.30. Operating rule — applied AUTOMATICALLY by the grid's
  * untuned escalation since r19, on the q25 statistic (see
  * [[relativeContrastStats]] for why the median alone cannot classify
  * a bimodal mixture): q25 ≲ 2 → treat the catalog as spread-shaped
  * (base efSearch ≥ 128 per the measured ladder, or the full-beam
  * sentinel); q25 ≳ 3 → the clustered defaults apply as measured.
  * The half-clustered/half-uniform mixture (embMode=mixed, 2·10⁵
  * keys) measures q25 = 1.44 — firmly in the spread regime, where
  * the raised default base measures recall@10 0.9939 on the whole
  * mixed catalog (SCALE_r19_recall_200k_mixed_default).
  *
  * Cost: one hash-ordered top-K sample scan (TakeOrderedAndProject —
  * per-partition heaps, no full sort) plus ONE full-catalog pass for
  * the broadcast 256-query top-1 ([[KnnJoin.broadcastKnn]]: map-side
  * partial top-k, no pair-row shuffle — the flagship's own exact-kNN
  * plan shape), plus an O(sample²) driver mean. Collects are bounded by
  * `sample` rows (the sanctioned metadata-sized fold).
  */
object ShapeStats {

  /** Median relative contrast of a seeded `sample` of queries from
    * `cat` against the full catalog. True L2 (mean/min is not
    * monotone-invariant to squaring). Returns 1.0 degenerately when
    * fewer than 3 sample vectors exist — no contrast measurable, and a
    * catalog that small is exact-tier territory anyway.
    */
  def relativeContrast(
      cat: DataFrame,
      idCol: String,
      vecCol: String,
      sample: Int = 256,
      seed: Int = 17): Double =
    relativeContrastStats(cat, idCol, vecCol, sample, seed).median

  /** Both order statistics of the per-query contrast distribution, one
    * catalog pass: `median` (the published tier-stable anchor) and
    * `q25` (the lower quartile — the GATE's decision statistic).
    *
    * Why two: the median is the right summary for a unimodal catalog
    * (both fixtures' anchors), but on a BIMODAL mixture near 50/50 it
    * is knife-edged — it snaps to whichever mode the seeded draw tips
    * past half, not to anything intermediate. MEASURED on the r19
    * mixed fixture (MakeScale embMode=mixed at 2·10⁵: ~51% jittered
    * clusters / ~49% uniform): the committed seeded draw reads median
    * rc = 1.5233 — indistinguishable from the fully-spread anchor —
    * while an independent draw of the same catalog reads ≈ 5.2
    * (SCALE_r19_shape_mixed.json and the COVERAGE.md note). The rc
    * "gray zone" (2 ≲ rc ≲ 3) is therefore NOT where mixtures land;
    * mixtures are bimodal and the median jumps across it. What recall
    * actually depends on is the FRACTION of queries in the spread
    * regime (each such query pays the measured spread floors at the
    * default beam), so the gate decides on q25: any catalog where a
    * material (≳ ¼) share of queries measures spread-like fires the
    * raise DETERMINISTICALLY — a 50/50 mixture always gets the wider
    * beam its spread half measurably needs — while fully-clustered
    * catalogs (q25 ≈ the median ≈ 6) keep the default. The residual
    * ambiguous band (spread share near ¼) errs toward the beam raise,
    * the recall-safe side of a ~2× search-compute trade.
    */
  def relativeContrastStats(
      cat: DataFrame,
      idCol: String,
      vecCol: String,
      sample: Int = 256,
      seed: Int = 17): RcStats = {
    require(sample >= 3, s"ShapeStats: sample must be >= 3, got $sample")
    val degenerate = RcStats(1.0, 1.0)
    // ids hash to longs so any key type rides broadcastKnn, and
    // self-exclusion keys on the same hash on both sides
    val base = cat.select(
      xxhash64(col(idCol).cast("string")).as("id"),
      col(vecCol).cast("array<float>").as("vec"))
    // seeded hash-ordered top-K: Spark plans orderBy+limit as
    // TakeOrderedAndProject (per-partition heaps, no full sort, no
    // pre-count job), the pick is uniform across the catalog (hash
    // order is unrelated to storage order) and DETERMINISTIC across
    // layouts (id tiebreak — a bare limit() after a filter takes
    // whichever partitions answer first)
    val sampled = base
      .withColumn("__h", xxhash64(col("id"), lit(seed)))
      .orderBy("__h", "id")
      .limit(sample)
      .drop("__h")
      .localCheckpoint() // reused: the driver mean AND the kNN query side
    val rows = sampled.collect()
    if (rows.length < 3) return degenerate
    val ids = rows.map(_.getLong(0))
    val vs: Array[Array[Float]] = rows.map(_.getSeq[Float](1).toArray)
    val m = vs.length

    // per-query mean distance, within the sample (concentration-accurate)
    val means = new Array[Double](m)
    var i = 0
    while (i < m) {
      var sum = 0.0
      var j = 0
      while (j < m) {
        if (j != i) {
          var d2 = 0.0
          val a = vs(i); val b = vs(j)
          var k = 0
          while (k < a.length && k < b.length) {
            val diff = a(k) - b(k); d2 += diff * diff; k += 1
          }
          sum += math.sqrt(d2)
        }
        j += 1
      }
      means(i) = sum / (m - 1)
      i += 1
    }

    // per-query nearest neighbor against the FULL catalog: one scan,
    // broadcast queries, partial top-1 per partition — never a pair shuffle
    val nn: Map[Long, Double] = KnnJoin
      .broadcastKnn(sampled, base, "id", "vec", k = 1)
      .select(col("query_id"), col("dist"))
      .collect()
      .map(r => r.getLong(0) -> math.sqrt(r.getDouble(1)))
      .toMap

    val rcs = ids.zipWithIndex.map { case (id, q) =>
      nn.get(id) match {
        // an exact duplicate in the catalog gives nn = 0: contrast is
        // effectively infinite there — clamp to a FINITE documented
        // sentinel ([[DuplicateContrast]]) so duplicates can neither
        // NaN the median nor print an unreadable 1.8e308 into a
        // committed shape artifact (an all-duplicates catalog IS
        // maximally clustered, and 10⁶ sits as far above the rc ≳ 3
        // clustered threshold as any real ratio ever measures)
        case Some(d) if d > 0.0 => math.min(means(q) / d, DuplicateContrast)
        case Some(_) => DuplicateContrast
        case None => DuplicateContrast // sole-member id: no non-self neighbor
      }
    }
    java.util.Arrays.sort(rcs)
    // true median: average the middle pair on even sample sizes (the
    // default m = 256 is even — the upper-middle pick alone would bias
    // the statistic by half an order-statistic gap)
    val median =
      if (m % 2 == 1) rcs(m / 2)
      else (rcs(m / 2 - 1) + rcs(m / 2)) / 2.0
    // lower quartile as the ⌊(m−1)/4⌋-th order statistic — the gate's
    // decision value (see relativeContrastStats)
    RcStats(median, rcs(math.max(0, (m - 1) / 4)))
  }

  /** One catalog's contrast summary: the published `median` and the
    * gate's `q25` (see [[relativeContrastStats]]).
    */
  final case class RcStats(median: Double, q25: Double)

  /** Per-query contrast sentinel for exact-duplicate (nn = 0) queries —
    * finite so the reported median stays readable against the rc ≲ 2 /
    * ≳ 3 operating thresholds even when duplicates are the majority.
    */
  val DuplicateContrast: Double = 1e6

  /** The classifier threshold of the operating rule, applied by the
    * gate to the LOWER QUARTILE (see [[relativeContrastStats]]): q25
    * at or below this means a material share of queries is in the
    * SPREAD regime — where the clustered default beam measurably sheds
    * recall and the measured fix is the doubled base
    * ([[BeamLaw.SpreadBaseEf]]). Sits between the measured spread
    * anchors (≈ 1.5 at both tiers; mixtures' spread mode ≈ 1.4) and
    * the clustered ones (≈ 6.3): a catalog must MEASURE like the
    * adversarial fixtures on a quarter of its queries to pay the
    * doubled beam.
    */
  val SpreadRcMax: Double = 2.0
}
