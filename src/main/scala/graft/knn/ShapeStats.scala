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
  * MEASURED anchors, committed in SCALE_r18_shape_contrast*.json (the
  * `shape` ScaleProbe mode; 256-query sample, d = 64) — the statistic
  * is TIER-STABLE per shape, which is what makes it usable as a
  * classifier: the jittered-copy clustered fixtures (the shape whose
  * recall rows measure ≥ 0.99 under the beam law) score rc = 6.32 at
  * 2·10⁴ keys and 6.23 at 10⁶; the adversarial `embMode=spread`
  * uniform fixtures score 1.52 at 2·10⁵ and 1.56 at 10⁶ (on uniform
  * data rc drifts up only as N^(1/d) — negligibly); the raw sf0.1
  * driver embeddings (2k random vectors — spread-shaped by
  * construction, and exact-tier by size anyway) score 1.30. Operating
  * rule: rc ≲ 2 → treat the catalog as spread-shaped (set base
  * efSearch ≥ 128 per the measured ladder, or the full-beam sentinel);
  * rc ≳ 3 → the clustered defaults apply as measured.
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
      seed: Int = 17): Double = {
    require(sample >= 3, s"ShapeStats: sample must be >= 3, got $sample")
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
    if (rows.length < 3) return 1.0
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
    if (m % 2 == 1) rcs(m / 2)
    else (rcs(m / 2 - 1) + rcs(m / 2)) / 2.0
  }

  /** Per-query contrast sentinel for exact-duplicate (nn = 0) queries —
    * finite so the reported median stays readable against the rc ≲ 2 /
    * ≳ 3 operating thresholds even when duplicates are the majority.
    */
  val DuplicateContrast: Double = 1e6

  /** The classifier threshold of the operating rule: rc at or below this
    * is SPREAD-SHAPED — the regime where the clustered default beam
    * measurably sheds recall and the measured fix is the doubled base
    * ([[BeamLaw.SpreadBaseEf]]). Sits between the measured spread
    * anchors (≈ 1.5 at both tiers) and the clustered ones (≈ 6.3),
    * below the r19 mixed-shape gray-zone point, on the conservative
    * side: a catalog must MEASURE like the adversarial fixtures to pay
    * the doubled beam.
    */
  val SpreadRcMax: Double = 2.0
}
