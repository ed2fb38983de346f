package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.discover.{Discovery, Eval}
import graft.embed.{Embedder, HashEmbedder}
import graft.knn.KnnJoin
import graft.profile.Profiler
import graft.sources.Lake

/** The reference's evaluation grid (SemLink/join_discoverer.py:454–518):
  * sweep k ∈ {5,10,25} × threshold ∈ {0.1..0.4}, reporting P/R/F1 and
  * NDCG@k per cell against a ground-truth pair relation.
  *
  * The reference recomputes the FAISS search for every threshold although
  * distances depend only on k (join_discoverer.py:485–498) — here the kNN
  * Dataset is computed ONCE per k (for the max k, then filtered by rank)
  * and cached; thresholds are pure filters over it (SURVEY.md §4.1).
  */
object SemLinkGrid {

  /** The flagship gate's default escalation threshold: a catalog past
    * this many keys routes the grid's single kNN pass through IVF
    * (auto-√N lists) instead of exact blocked self-kNN. Exact self-kNN
    * is O(N²·d) no matter how it is blocked — SCALE_r13 measured the
    * exact path growing 5.05× for 10× data while the auto IVF path grew
    * 3.14× (and 37.98× vs 66.09× at the 100× tier) — so an UNTUNED
    * caller must not default onto the one plan in the engine that
    * cannot survive a large catalog. 10⁵ keys ≈ the single-broadcast
    * block size: below it the exact path is one broadcast pass and
    * cheap; above it the exact path starts paying quadratic distance
    * work AND multi-block orchestration, while IVF at the default
    * nProbe keeps recall high on clustered catalogs. Escalation is
    * logged loudly; pass `annAbove = Long.MaxValue` to force exact at
    * any size (the oracle paths pin exactness explicitly instead).
    */
  val DefaultAnnAbove: Long = 100000L

  /** The SECOND escalation tier: a catalog past this many keys routes
    * the grid kNN through the sharded HNSW graph family
    * ([[graft.knn.ApproxKnn.hnswBlockKnn]] — built once into a scratch
    * [[graft.knn.HnswIndex]], query side streamed in bounded blocks)
    * instead of IVF. Auto-√N IVF is Θ(N^1.5) by construction (per-query
    * probe work grows as √N, and every probed candidate pair
    * materializes through a shuffle join): SCALE_r14_default_gate
    * measured the escalated IVF grid at 174.9 s for 200k keys vs 1.4 s
    * at 2k. The sharded HNSW beam is `shards·ef·log(N/shards)` per
    * query — N·log N overall — and emits only top-k rows from
    * `mapPartitions`, no pair-row shuffle; SCALE_r16_default_gate
    * MEASURES the untuned 200k-key grid on this tier at 76.9 s
    * (forced-HNSW row: 72.5 s) vs the IVF tier's 174.9 s on the
    * identical catalog (SCALE_r14_default_gate), growing 62.8× per
    * 100× data where IVF grew 124× — the log N vs √N per-query gap,
    * widening with N. At the 10⁶-key tier the RAW beam (ef 64,
    * SCALE_r16_1m) measures 688.9 s — per-key cost 0.38 → 0.69 ms
    * across 5× more keys (1.8× per key: between pure log-N's 1.2× and
    * √N's 2.2×, far below exact's 5×); the untuned default NOW runs
    * the beam law there (ef 128) at a measured 914.9 s
    * (SCALE_r17_1m_auto — the ~2× beam cost lands on the search leg
    * only; build dominates the rest), still far under IVF's Θ(N^1.5)
    * projection of ~1950 s from its own 200k measurement; the
    * crossover in HNSW's favor is already behind the gate at 10⁵ and
    * only widens.
    * RECALL at the tiers where this gate fires is measured, not
    * extrapolated (the `gridrecall` probe scores the untuned default's
    * own output against brute-force truth on ~500 sampled queries):
    * recall@10 = 1.0000 at the 200k tier (SCALE_r17_recall_200k) and
    * 0.9680 at the 10⁶ tier (SCALE_r17_recall_1m) at a FIXED
    * efSearch = 64 — the expected mild log-N beam decay as per-shard
    * graphs grow; both clear the drift-mix floor (0.8) with margin.
    * The ef knob is measured, not guessed
    * (SCALE_r17_recall_{200k_ef32,1m_ef128}): at 200k, HALVING the
    * beam (ef 32) still scores 0.9996 — the down-tuning room near the
    * gate; at 10⁶, DOUBLING it (ef 128) restores 0.9949 at ~2× beam
    * cost. Since round 17 the gate APPLIES that measured trade instead
    * of documenting it as an operational rule: [[autoEfSearch]] holds
    * the base beam to [[EfHoldKeys]] = 5·10⁵ keys and doubles it once
    * per [[EfDoublePerKeys]] = 5× keys past that, so the untuned
    * default's recall stays at build level across tiers ON THE
    * CLUSTERED SHAPE instead of decaying one beam-decay step per
    * catalog decade (measured under the law: recall@10 = 0.9949 at
    * 10⁶ keys, SCALE_r17_1m_auto, vs 0.9680 fixed; the adversarial
    * spread shape's measured ladder is below). `efAutoScale = false` pins the raw knob
    * (the ef-sensitivity artifacts above are raw runs); efSearch <= 0
    * remains the rank-exact full beam, never scaled.
    * The default equals [[DefaultAnnAbove]]: every
    * untuned escalation goes straight to the N·log N plan, and the IVF
    * tier remains the EXPLICIT middle choice (`hnswAbove =
    * Long.MaxValue`, or tuned nList/nProbe — its full-probe sentinel is
    * the grid's rank-exact oracle form, q93/q94). That ordering now has
    * a measured QUALITY argument on top of the runtime one: the full
    * shape × engine matrix at the 200k tier, identical defaults
    * (SCALE_r17_recall_200k{,_ivf,_spread,_spread_ef128,_spread_ivf})
    * — HNSW 1.0000 clustered / 0.9186 fully-spread (0.9736 at one
    * beam doubling); IVF 1.0000 clustered / 0.2886 fully-spread
    * (nProbe 16 of ~448 auto lists = 3.6% probed, and with no
    * cluster structure the probed fraction IS roughly the recall;
    * 0.7614 already on the 2k-key spread catalog probing 16 of 45).
    * The cluster-pruned engine COLLAPSES on the shape an untuned
    * caller cannot rule out, while the graph degrades gracefully and
    * answers to the beam knob. The spread shape (uniform components,
    * no cluster structure) is the adversarial extreme — distance
    * concentration makes it the hardest regime for any ANN — so its
    * rows are worst-case floors, not typical expectations: real
    * embedding catalogs cluster, and both clustered tiers measure
    * ≥0.99 under the beam law. The spread shape is measured at BOTH
    * gate tiers (round 18 closed the last extrapolated cell): under
    * the law it decays ~0.03 per 5× step instead of holding — 0.9186
    * at 2·10⁵/ef 64 → 0.8916 at 10⁶/law'd ef 128
    * (SCALE_r18_recall_1m_spread; floor-clear, not build-level) — and
    * the measured fix is a DOUBLED base efSearch = 128: 0.9736 at
    * 2·10⁵, resolved by the law to ef 256 at 10⁶ where it measures
    * 0.9578 (SCALE_r18_recall_1m_spread_ef256; the ladder's measured
    * endpoint is ef 512 → 0.9888, SCALE_r19_recall_1m_spread_ef512 —
    * decelerating gains, so strict build-level on this shape still
    * means the full-beam sentinel). Base ≥ 128 or the full-beam
    * sentinel is therefore the knowingly-spread-catalog setting — and
    * since r19 the UNTUNED gate applies it itself (the same
    * measured-rule-to-default-on maturation the beam law took in
    * r17): [[graft.knn.ShapeStats.relativeContrastStats]] measures
    * WHICH regime a catalog is in (one pass; tier-stable anchors:
    * clustered median ≈ 6.3 / q25 ≈ 6.05, spread 1.52–1.56 / q25
    * 1.50–1.53 — SCALE_r19_shape_* supersede the r18 anchors under
    * the exact-median fix), and [[resolveShapeBase]] raises an
    * untuned base whose q25 sits at or below 2 to the measured spread
    * fix before the size law runs (the QUARTILE, not the median: a
    * bimodal mixture's median snaps to a mode — see
    * relativeContrastStats) — measured end-to-end on the DEFAULT
    * path: recall@10 0.9578 at the spread 10⁶ tier with NO knob set
    * (SCALE_r19_recall_1m_spread_default), 0.9939 on the half/half
    * mixed 2·10⁵ catalog (SCALE_r19_recall_200k_mixed_default), the
    * clustered tiers unchanged by construction (q25 ≈ 6 keeps the
    * default base: 0.9949 re-measured at 10⁶,
    * SCALE_r19_recall_1m_clustered_default).
    * The probe runs ONLY on the untuned HNSW escalation (a catalog
    * past this gate pays an index build, so the one 256-query rc pass
    * is noise against it; smaller catalogs never pay it);
    * `shapeAutoScale = false` opts out of just the probe,
    * `efAutoScale = false` pins the raw knob entirely. Like
    * `annAbove`, `Long.MaxValue` opts out of the whole tier.
    */
  val DefaultHnswAbove: Long = DefaultAnnAbove

  /** The measured hold range of the HNSW tier's base beam: a given
    * efSearch keeps ~build-level recall while the catalog stays within
    * this many keys (SCALE_r17_recall_200k: ef 64 → recall@10 1.0000 at
    * 2·10⁵; the decay only appears past ~5·10⁵ — 0.9680 at 10⁶,
    * SCALE_r17_recall_1m). Shared anchor of [[autoEfSearch]]; the law
    * itself lives in [[graft.knn.BeamLaw]] — [[graft.knn.HnswIndex]]
    * applies the same rule to its persistent serving path, whose corpus
    * grows under streaming appends the same way the grid's catalog
    * grows across tiers.
    */
  val EfHoldKeys: Long = graft.knn.BeamLaw.HoldKeys

  /** Catalog growth per beam doubling past [[EfHoldKeys]]: the measured
    * trade (SCALE_r17_recall_1m_ef128: one doubling restores 0.9949 at
    * 2× keys past the hold range) rounded to the conservative side —
    * per-shard beam work is `ef·log(N/shards)`, so each doubling costs
    * ~2× search compute and buys ~5× catalog at held recall.
    */
  val EfDoublePerKeys: Double = graft.knn.BeamLaw.DoublePerKeys

  /** The HNSW tier's beam-width law — [[graft.knn.BeamLaw.autoEf]]:
    * `base` up to [[EfHoldKeys]] keys, then one doubling per
    * [[EfDoublePerKeys]]× keys (ceil — the quality-first side of the
    * measured rule, so 10⁶ keys already gets the doubling that
    * SCALE_r17_recall_1m_ef128 measured restoring 0.9949 from the fixed
    * beam's 0.9680). `base <= 0` (the rank-exact full-beam sentinel) is
    * returned untouched — exactness needs no scaling.
    */
  private[graft] def autoEfSearch(base: Int, n: Long): Int =
    graft.knn.BeamLaw.autoEf(base, n)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** One grid cell: the discovered (query, candidate, dist) pairs and the
    * one-row metrics frame (k, threshold, tp, fp, fn, precision, recall,
    * f1, ndcg).
    */
  final case class GridCell(k: Int, threshold: Double,
      discovered: DataFrame, metrics: DataFrame)

  /** What the escalation gate ACTUALLY ran — the surface the scale
    * probes record, so a committed artifact reflects the real plan
    * rather than re-deriving thresholds, the beam law, or the IVF
    * sizing rule (any of which a future gate change could silently
    * desynchronize from the artifact):
    *
    *  - `engine` — "exact" / "ivf" / "hnsw";
    *  - `efUsed` — the EFFECTIVE beam the HNSW tier ran
    *    (post-[[autoEfSearch]]); the caller's `efSearch` verbatim on
    *    the other engines, where it is inert;
    *  - `baseEf` — the base the law scaled: the caller's knob, or the
    *    shape-raised [[graft.knn.BeamLaw.SpreadBaseEf]] when the shape
    *    probe fired;
    *  - `rc`/`rcQ25` — the measured contrast statistics
    *    ([[graft.knn.ShapeStats.relativeContrastStats]]: the published
    *    median and the lower quartile the DECISION uses — a bimodal
    *    mixture's median snaps to a mode, the quartile fires on any
    *    material spread share), when the shape probe ran (untuned HNSW
    *    escalations only);
    *  - `nList`/`nProbe` — the RESOLVED IVF knobs
    *    ([[resolveIvfParams]] — auto-√N sizing and full-probe/clamp
    *    sentinels applied), ivf engine only.
    */
  final case class GridEngine(
      engine: String,
      efUsed: Int,
      baseEf: Int,
      rc: Option[Double] = None,
      rcQ25: Option[Double] = None,
      nList: Option[Int] = None,
      nProbe: Option[Int] = None)

  /** The UNTUNED base beam of the HNSW tier — the value the shape rule
    * treats as "no caller choice": the probe-and-raise path runs only
    * when `efSearch` is left here, because an EXPLICIT base (wider for
    * quality, narrower for speed) is a caller decision the gate must
    * not override (an explicit 64 is indistinguishable from the
    * default and gets the probe — harmless, it IS the default).
    */
  val DefaultEfSearch: Int = 64

  /** The shape-aware base-beam rule, isolated for direct spec pinning
    * against the committed rc anchors — applied to the LOWER-QUARTILE
    * contrast ([[graft.knn.ShapeStats.relativeContrastStats]].q25; the
    * median would coin-flip on a bimodal mixture): a catalog whose q25
    * sits at or below [[graft.knn.ShapeStats.SpreadRcMax]] (spread
    * anchors ≈ 1.5 at 2·10⁵ AND 10⁶ keys — tier-stable; a 50/50
    * mixture's spread mode ≈ 1.4) gets its base raised to
    * [[graft.knn.BeamLaw.SpreadBaseEf]] (never lowered: a caller who
    * set a wider base keeps it); a clustered catalog (q25 ≈ 6) keeps
    * the untuned default, whose recall is measured ≥ 0.99 under the
    * law at both tiers.
    */
  private[graft] def resolveShapeBase(rcQ25: Double, base: Int): Int =
    if (rcQ25 <= graft.knn.ShapeStats.SpreadRcMax)
      math.max(base, graft.knn.BeamLaw.SpreadBaseEf)
    else base

  /** The shared grid plumbing: one kNN pass at max(k), cached; every
    * (k, threshold) cell is a pure filter over it.
    */
  def gridCells(
      spark: SparkSession,
      dir: String,
      groundTruth: DataFrame, // (query_table, query_column, candidate_table, candidate_column)
      ks: Seq[Int] = Seq(5, 10, 25),
      thresholds: Seq[Double] = Seq(0.1, 0.2, 0.3, 0.4),
      embedder: Embedder = HashEmbedder(),
      tables: Seq[String] = Lake.lakeTables): Seq[GridCell] = {
    import graft.functions.TextFns

    val profiles = Profiler.profileLake(spark, dir, tables)
    val embedded = SemLink.columnTexts(profiles)
      .withColumn("vec", embedder.embedColumn(col("text")))

    // composite keys (join_discoverer.py:392–397)
    gridCellsFromCatalog(embedded,
      groundTruth.select(
        TextFns.columnKey(col("query_table"), col("query_column")).as("q"),
        TextFns.columnKey(col("candidate_table"), col("candidate_column")).as("c")),
      ks, thresholds)
  }

  /** The grid core over ANY (key, vec) catalog — the lake pipeline above
    * is one caller (profile → serialize → embed); a pre-embedded corpus
    * (the q89 oracle path, where the kNN + per-cell A8/A9 math is
    * replayed in SQL over stored vectors) is another. `groundTruth` is a
    * two-column (q, c) key-grain pair relation, symmetrized here.
    */
  def gridCellsFromCatalog(
      catalog: DataFrame, // (key, vec) + anything else, pruned here
      groundTruth: DataFrame, // (q, c) on catalog keys
      ks: Seq[Int],
      thresholds: Seq[Double],
      annAbove: Long = DefaultAnnAbove,
      nList: Int = 0,
      nProbe: Int = 16,
      hnswAbove: Long = DefaultHnswAbove,
      efSearch: Int = 64,
      efAutoScale: Boolean = true,
      shapeAutoScale: Boolean = true,
      scratchDir: Option[String] = None): Seq[GridCell] = {
    // fail fast on an empty sweep — ks.max and the callers' metric
    // reduces would otherwise surface as bare empty.max/empty.reduce
    // after the expensive profiling already ran
    require(ks.nonEmpty && thresholds.nonEmpty,
      "gridCellsFromCatalog: ks and thresholds must be non-empty")
    // lazy localCheckpoints, not cache(): blocks release with the frames
    // (the SemLink.knnPairs rule — cache() pins them for the session)
    val embedded = catalog.select("key", "vec")
      .localCheckpoint(eager = false)

    // THE scale weight of the grid is not the kNN — it is the truth
    // relation: a pair-grain ground truth over same-group keys grows
    // QUADRATICALLY in group size (a 10-label 20k-key probe catalog
    // symmetrizes to 40M pairs), and every metric joins against it.
    // Three measures keep that weight paid ONCE, not once per cell:
    //  - metrics run in LONG-ID space: truth keys hash through the same
    //    xxhash64 the kNN uses internally, so the 6 truth-side
    //    aggregations below ship 16-byte pairs instead of string pairs
    //    (collision odds across a catalog are ~n²/2^65 — negligible,
    //    and the kNN side already accepts them by construction);
    //  - symmetrize + distinct runs once, and the result is checkpointed
    //    PRE-PARTITIONED on the (query, candidate) join key, so the
    //    per-cell joins reshuffle only the (small) discovered side;
    //  - per-cell P/R/F1 uses fn = |truth| − tp (microPrf1Counted): a
    //    left join over the discovered side, never a per-cell
    //    full-outer that re-ships the whole truth relation.
    // symmetric GT (join_discoverer.py:392–397): output (query, candidate)
    // cast-to-string BEFORE hashing (both here and in gridKnnIds): the
    // pre-hash code joined raw values, where Spark's comparison
    // coercion matched a long-typed truth column against string catalog
    // keys — xxhash64(5L) != xxhash64("5") would turn that tolerated
    // mixed-type call into silent all-miss metrics
    val truth = Discovery.symmetrizeGroundTruth(
        groundTruth.toDF("q", "c").select(
          xxhash64(col("q").cast("string")).as("q"),
          xxhash64(col("c").cast("string")).as("c")),
        "q", "c")
      // hash placement is the right call HERE (vs the ShardSlots slot
      // mapping the shard-keyed sites use): the key space is the full
      // (query, candidate) pair domain — cardinality >> partitions, so
      // collisions average out and per-task load is row-bounded, not
      // graph-bounded
      .repartition(col("query"), col("candidate"))
      .localCheckpoint(eager = false)
    val nTruth = truth.count() // one action: materializes the checkpoint
    // relevant-per-query counts are k-independent — aggregate once and
    // keep them driver-small (one row per query key)
    val relCounts = truth.groupBy("query")
      .agg(count(lit(1)).as("n_relevant"))
      .localCheckpoint(eager = false)

    val kMax = ks.max
    // ONE kNN pass at kMax; every (k, t) cell is a pure filter over it.
    // Metrics consume the LONG-ID core; only the user-facing discovered
    // frames pay the id → key map-back (two broadcast joins, per cell,
    // evaluated only if the caller uses them)
    val (coreKnn, keys, eng) = gridKnnIds(embedded, kMax,
      annAbove = annAbove, nList = nList, nProbe = nProbe,
      hnswAbove = hnswAbove, efSearch = efSearch,
      efAutoScale = efAutoScale, shapeAutoScale = shapeAutoScale,
      scratchDir = scratchDir)
    val knn = coreKnn.localCheckpoint(eager = false)
    knn.count() // materialize once

    // ONE left join of the kMax kNN against the (pre-partitioned,
    // checkpointed) truth relation, checkpointed: every (k, threshold)
    // cell's tp/fp AND every per-k DCG reduce to conditional aggregates
    // over this frame — |cells| + |ks| truth-side joins collapse to one
    // (the reference default sweep is 12 cells; each join re-shipped
    // the cell's discovered rows into the truth partitioning). kNN rows
    // are unique per (query, candidate) by construction — every engine
    // emits one row per neighbor through a ranking window or
    // disjoint-list scan — so the cell filters below preserve the
    // distinctness microPrf1 semantics require.
    val knnMarked = knn
      .select(col("query_id").as("query"),
        col("neighbor_id").as("candidate"), col("dist"), col("rank"))
      .join(truth.select(col("query"), col("candidate"))
        .withColumn("__t", lit(1)), Seq("query", "candidate"), "left")
      .localCheckpoint(eager = false)

    // NDCG depends only on k — compute and MATERIALIZE it once per k
    // (a lazy per-cell frame would re-run the join+aggregate for every
    // (k, threshold) cell, |thresholds|× redundant scans); it is one
    // scalar per k, so the collect is driver-trivial
    val ndcgByK: Map[Int, Option[Double]] = ks.distinct.map { k =>
      val row = Eval.ndcgAtK(
        knn.filter(col("rank") <= k)
          .select(col("query_id").as("query"),
            col("neighbor_id").as("candidate"), col("rank")),
        truth, k, truthIsDistinct = true, preRelCounts = Some(relCounts),
        preMarked = Some(knnMarked))
        .select("ndcg").collect().head
      k -> (if (row.isNullAt(0)) None else Some(row.getDouble(0)))
    }.toMap

    for (k <- ks; t <- thresholds) yield {
      val topK = knn.filter(col("rank") <= k)
      val discoveredIds = Discovery.thresholdFilter(topK, "dist", t)
        .select(col("query_id").as("query"), col("neighbor_id").as("candidate"),
          col("dist"))
      val discovered = discoveredIds
        .join(broadcast(keys.select(col("id").as("query"),
          col("key").as("__qkey"))), Seq("query"))
        .join(broadcast(keys.select(col("id").as("candidate"),
          col("key").as("__ckey"))), Seq("candidate"))
        .select(col("__qkey").as("query"), col("__ckey").as("candidate"),
          col("dist"))
      val prf = Eval.microPrf1Marked(
        Discovery.thresholdFilter(knnMarked.filter(col("rank") <= k),
          "dist", t), nTruth)
      // the ENGINE that produced the kNN rides on every metrics row:
      // the escalation gate switches exact → ANN with only a WARN log
      // as the signal otherwise, and a downstream metrics consumer must
      // be able to tell exact from ANN-derived precision/recall without
      // scraping logs (the oracle paths pin the column per strategy)
      val metrics = prf
        .withColumn("ndcg",
          ndcgByK(k).map(lit(_)).getOrElse(lit(null)).cast("double"))
        .withColumn("k", lit(k))
        .withColumn("threshold", lit(t))
        .withColumn("engine", lit(eng.engine))
        .select("k", "threshold", "tp", "fp", "fn",
          "precision", "recall", "f1", "ndcg", "engine")
      GridCell(k, t, discovered, metrics)
    }
  }

  /** The grid's single kNN pass on the broadcast + partial-top-k scale
    * path — the same shape as `SemLink.knnPairs`: string column keys are
    * mapped to deterministic `xxhash64` longs, searched as longs, and
    * mapped back via two broadcast joins. The former windowKnn shape
    * (cross join + ranking window partitioned by STRING keys) pushed N²
    * rows through a shuffle — fine at 10⁴ columns, fatal at a 10⁶-column
    * catalog. Output: (query_id, neighbor_id, dist, rank) on string keys.
    *
    * Driver-memory gate: the self-kNN's query side IS the whole catalog,
    * so an unconditional broadcastKnn would `collect()` every vector to
    * the driver — fine at 10⁴ columns, a scale-killer at a 10⁶-column
    * lake. [[graft.knn.ApproxKnn.blockKnn]] bounds what the driver ever
    * holds to `blockSize` query rows per block (quantile-cut id ranges,
    * exact union of per-block top-k), and collapses to the single
    * broadcast pass when the catalog fits one block — so the metadata-
    * sized case pays nothing for the gate.
    *
    * Compute gate (`annAbove`): exact self-kNN is O(N²·d) distance work
    * no matter how it is blocked — the right ENGINE for a catalog past
    * ~annAbove keys is IVF ([[graft.knn.ApproxKnn.ivfKnn]]: cluster-
    * pruned candidate generation, same output contract), trading exact
    * recall for cluster-bounded work exactly as the reference's FAISS
    * switch from IndexFlatL2 to an IVF index would
    * (join_discoverer.py:209 trains a flat index — the reference never
    * met a catalog big enough to need this; at nProbe = nList the IVF
    * path degenerates to exhaustive search and reproduces the exact
    * ranking, which is how the spec pins it). Default =
    * [[DefaultAnnAbove]] (10⁵ keys): an untuned caller GATES — below
    * the threshold the plan is exact (every bench/oracle catalog sits
    * far below it), above it the default plan is the measured-survivable
    * IVF path, announced with a WARN log line. `Long.MaxValue` opts out
    * (exact at any size, the caller's explicit choice).
    *
    * Auto sizing (`nList <= 0`): a FIXED nList keeps the probed
    * fraction nProbe/nList constant, so per-query candidate work stays
    * O(N) and the escalation only shaves a constant off the N² grid.
    * The sentinel sizes nList ∝ √N (each inverted list holds ~√N
    * vectors), so constant-nProbe per-query work is O(nProbe·√N) and
    * the whole grid is O(N^1.5) — the standard IVF sizing rule.
    * The sentinel IS the default: a caller who escalates without
    * tuning gets O(N^1.5), not a constant-factor shave off N²
    * (SCALE_r12 measured fixed nList=64 growing 4.83× at 10× data vs
    * 3.21× for the auto rule). Explicit positive nList still wins.
    * `nProbe <= 0` means full probe (nProbe = resolved nList):
    * exhaustive, rank-exact — the oracle form of the auto path.
    */
  private[graft] def gridKnn(embedded: DataFrame, kMax: Int,
      blockSize: Int = 100000,
      annAbove: Long = DefaultAnnAbove,
      nList: Int = 0,
      nProbe: Int = 16,
      hnswAbove: Long = DefaultHnswAbove,
      efSearch: Int = 64,
      efAutoScale: Boolean = true,
      shapeAutoScale: Boolean = true,
      scratchDir: Option[String] = None): DataFrame =
    gridKnnWithEngine(embedded, kMax, blockSize, annAbove, nList, nProbe,
      hnswAbove, efSearch, efAutoScale, shapeAutoScale, scratchDir)._1

  /** [[gridKnn]] plus [[GridEngine]] — the plan the gate actually ran,
    * for artifacts and metrics consumers.
    */
  private[graft] def gridKnnWithEngine(embedded: DataFrame, kMax: Int,
      blockSize: Int = 100000,
      annAbove: Long = DefaultAnnAbove,
      nList: Int = 0,
      nProbe: Int = 16,
      hnswAbove: Long = DefaultHnswAbove,
      efSearch: Int = 64,
      efAutoScale: Boolean = true,
      shapeAutoScale: Boolean = true,
      scratchDir: Option[String] = None): (DataFrame, GridEngine) = {
    val (core, keys, eng) = gridKnnIds(embedded, kMax, blockSize,
      annAbove, nList, nProbe, hnswAbove, efSearch, efAutoScale,
      shapeAutoScale, scratchDir)
    (core
      .join(broadcast(keys.withColumnRenamed("id", "query_id")
        .withColumnRenamed("key", "__qkey")), Seq("query_id"))
      .join(broadcast(keys.withColumnRenamed("id", "neighbor_id")
        .withColumnRenamed("key", "__nkey")), Seq("neighbor_id"))
      .select(col("__qkey").as("query_id"), col("__nkey").as("neighbor_id"),
        col("dist"), col("rank")), eng)
  }

  /** [[gridKnn]]'s long-id core: (the kNN frame on xxhash64 ids, the
    * id → key dictionary). The grid's metrics path consumes the ids
    * directly — truth keys hash through the same function, so every
    * truth-side join ships 16-byte pairs — and only user-facing outputs
    * pay the map-back.
    */
  private[graft] def gridKnnIds(embedded: DataFrame, kMax: Int,
      blockSize: Int = 100000,
      annAbove: Long = DefaultAnnAbove,
      nList: Int = 0,
      nProbe: Int = 16,
      hnswAbove: Long = DefaultHnswAbove,
      efSearch: Int = 64,
      efAutoScale: Boolean = true,
      shapeAutoScale: Boolean = true,
      scratchDir: Option[String] = None)
      : (DataFrame, DataFrame, GridEngine) = {
    // string-canonicalized hash — must stay in lockstep with the truth
    // hashing in gridCellsFromCatalog (mixed-type tolerance note there)
    val withId = embedded
      .withColumn("id", xxhash64(col("key").cast("string")))
      .select("id", "key", "vec")
    val keys = withId.select("id", "key")
    // one catalog count serves the gates and the auto-nList rule
    // (column-pruned id scan; skipped entirely when the caller opted
    // out of BOTH gates with MaxValue). annAbove = MaxValue is the
    // documented force-exact opt-out and overrides the HNSW tier too —
    // a caller who pinned exactness must never be silently re-escalated
    // by a new default.
    val gated = annAbove != Long.MaxValue
    val n = if (gated) withId.count() else 0L
    if (gated && n > annAbove && hnswAbove != Long.MaxValue && n > hnswAbove) {
      // the SHAPE probe (the r19 maturation of the ShapeStats operating
      // rule from a documented diagnostic into gate behavior, the same
      // step the beam law took in r17): on the fully-UNTUNED escalation
      // path only — efSearch left at the default base (an explicit
      // base, wider or narrower, is a caller decision the gate never
      // overrides) and both auto-scale knobs on. A catalog this size
      // pays an index build, so one seeded 256-query rc pass is noise
      // against it: measure which column of the shape × engine recall
      // matrix this catalog is in, and raise the base beam to the
      // measured spread fix when rc says spread (clustered catalogs
      // keep the default unchanged — anchors ≈ 6.3 vs spread ≈ 1.5,
      // tier-stable). efAutoScale = false pins the raw knob for BOTH
      // laws (the ef-sensitivity artifacts are raw runs);
      // shapeAutoScale = false skips just the shape probe (and its
      // catalog pass) while keeping the size law. The DECISION is on
      // the lower quartile (a bimodal mixture's median snaps to a
      // mode; the quartile fires on any material spread share — see
      // ShapeStats.relativeContrastStats); the median rides along as
      // the published anchor statistic.
      val rcStats: Option[graft.knn.ShapeStats.RcStats] =
        if (shapeAutoScale && efAutoScale && efSearch == DefaultEfSearch)
          Some(graft.knn.ShapeStats.relativeContrastStats(withId, "id", "vec"))
        else None
      val base = rcStats.map(s => resolveShapeBase(s.q25, efSearch))
        .getOrElse(efSearch)
      // the beam-width law: the (possibly shape-raised) base is
      // calibrated at gate-tier scale; past EfHoldKeys the gate widens
      // it per the measured recall-decay trade so the UNTUNED default
      // holds build-level recall at any tier
      val ef = if (efAutoScale) autoEfSearch(base, n) else base
      // loud, named: the plan just changed ENGINE (exact → ANN) — see
      // the IVF branch's rationale
      log.warn(s"SemLinkGrid.gridKnn: catalog has $n keys > " +
        s"hnswAbove=$hnswAbove — escalating the grid kNN to the " +
        s"sharded HNSW tier (efSearch=$ef" +
        (if (base != efSearch) s"; base $efSearch raised to $base by the " +
          s"shape rule at measured rc q25=" +
          s"${rcStats.map(s => f"${s.q25}%.2f").get} (median " +
          s"${rcStats.map(s => f"${s.median}%.2f").get}) — " +
          "pass shapeAutoScale=false to skip the shape probe" else "") +
        (if (ef != base) s"; auto-scaled from base $base by the " +
          s"beam law at $n keys — pass efAutoScale=false to pin the raw " +
          "knob" else "") +
        "): N·log N beam work, no pair-row shuffle. Pass " +
        "annAbove=Long.MaxValue to force exact, hnswAbove=Long.MaxValue " +
        "for the IVF tier, or efSearch<=0 for full-beam (rank-exact) " +
        "HNSW.")
      (graft.knn.ApproxKnn.hnswBlockKnn(withId, withId, "id", "vec", kMax,
        metric = KnnJoin.MetricL2Sq, efSearch = ef,
        queryBlockSize = blockSize, excludeSelf = true,
        scratchDir = scratchDir),
        keys, GridEngine("hnsw", ef, base, rcStats.map(_.median),
          rcStats.map(_.q25)))
    } else if (gated && n > annAbove) {
      val (lists, probe) = resolveIvfParams(n, nList, nProbe)
      // loud, named: the plan just changed ENGINE (exact → ANN). A
      // silent switch would let a recall regression masquerade as a
      // data problem; an operator reading the log sees the knob — and
      // since round 15 the engine ALSO rides on every metrics row.
      log.warn(s"SemLinkGrid.gridKnn: catalog has $n keys > " +
        s"annAbove=$annAbove — escalating the grid kNN from exact " +
        s"blocked self-kNN (O(N²·d)) to IVF (nList=$lists, " +
        s"nProbe=$probe). Pass annAbove=Long.MaxValue to force the " +
        "exact path, or nProbe<=0 for full-probe (rank-exact) IVF.")
      (graft.knn.ApproxKnn.ivfKnn(withId, withId, "id", "vec", kMax,
        nList = lists, nProbe = probe, metric = KnnJoin.MetricL2Sq,
        excludeSelf = true),
        keys, GridEngine("ivf", efSearch, efSearch,
          nList = Some(lists), nProbe = Some(probe)))
    } else
      (graft.knn.ApproxKnn.blockKnn(withId, withId, "id", "vec", kMax,
        KnnJoin.MetricL2Sq, blockSize = blockSize, excludeSelf = true),
        keys, GridEngine("exact", efSearch, efSearch))
  }

  /** The escalation's IVF sizing rule, isolated for direct spec pinning.
    * `nList <= 0` → nList = max(16, ⌈√n⌉) (each list holds ~√n vectors;
    * with constant nProbe the per-query work is O(nProbe·√n)).
    * `nProbe <= 0` → full probe (= resolved nList: exhaustive, exact);
    * a positive nProbe is clamped to the resolved nList.
    */
  private[graft] def resolveIvfParams(n: Long, nList: Int,
      nProbe: Int): (Int, Int) = {
    val lists =
      if (nList > 0) nList
      else graft.knn.ApproxKnn.autoNList(n)
    val probe = if (nProbe > 0) math.min(nProbe, lists) else lists
    (lists, probe)
  }

  /** One grid cell row per (k, threshold):
    * (k, threshold, tp, fp, fn, precision, recall, f1, ndcg).
    */
  def evaluationGrid(
      spark: SparkSession,
      dir: String,
      groundTruth: DataFrame,
      ks: Seq[Int] = Seq(5, 10, 25),
      thresholds: Seq[Double] = Seq(0.1, 0.2, 0.3, 0.4),
      embedder: Embedder = HashEmbedder(),
      tables: Seq[String] = Lake.lakeTables): DataFrame =
    gridCells(spark, dir, groundTruth, ks, thresholds, embedder, tables)
      .map(_.metrics).reduce(_.unionByName(_))

  /** [[evaluationGrid]] over a pre-embedded (key, vec) catalog.
    * `annAbove` / `nList` / `nProbe` / `hnswAbove` / `efSearch`: the
    * [[gridKnn]] compute gates — a catalog past `annAbove` keys routes
    * the single kNN pass through an ANN engine instead of exact blocked
    * search (default [[DefaultAnnAbove]] = 10⁵ keys, logged loudly when
    * it fires and surfaced in the returned `engine` column;
    * `Long.MaxValue` forces exact at any size). The escalation engine is
    * the sharded HNSW tier past `hnswAbove` keys (default
    * [[DefaultHnswAbove]] — N·log N; `efSearch <= 0` means full beam,
    * exact; a positive `efSearch` is the beam at gate-tier scale,
    * widened past [[EfHoldKeys]] keys by the measured [[autoEfSearch]]
    * law unless `efAutoScale = false`) and IVF between the two
    * thresholds (`nList <= 0` sizes lists ∝ √N automatically;
    * `nProbe <= 0` means full probe, exact). `scratchDir`: where the
    * HNSW tier stages its scratch graphs — REQUIRED on a non-local
    * master (a shared-filesystem path: hdfs:/s3a:/...), because the
    * driver-local temp default is refused there (executors could not
    * read it — the [[graft.knn.ApproxKnn.hnswBlockKnn]] guard); on
    * local masters the default temp is correct and self-cleaning.
    */
  def evaluationGridFromCatalog(
      catalog: DataFrame,
      groundTruth: DataFrame,
      ks: Seq[Int],
      thresholds: Seq[Double],
      annAbove: Long = DefaultAnnAbove,
      nList: Int = 0,
      nProbe: Int = 16,
      hnswAbove: Long = DefaultHnswAbove,
      efSearch: Int = 64,
      efAutoScale: Boolean = true,
      shapeAutoScale: Boolean = true,
      scratchDir: Option[String] = None): DataFrame =
    gridCellsFromCatalog(catalog, groundTruth, ks, thresholds,
        annAbove, nList, nProbe, hnswAbove, efSearch, efAutoScale,
        shapeAutoScale, scratchDir)
      .map(_.metrics).reduce(_.unionByName(_))

  /** Reference-parity export (join_discoverer.py:491–517): one CSV of
    * discovered joinable pairs per cell (`pairs_k<k>_t<t>`, JoinablePair
    * shape, sorted by distance) plus the grid summary as
    * `evaluation_results`. Single-file CSVs — these are evaluation
    * artifacts, metadata-sized by construction. Returns the grid frame.
    */
  def exportGrid(
      spark: SparkSession,
      dir: String,
      groundTruth: DataFrame,
      outDir: String,
      ks: Seq[Int] = Seq(5, 10, 25),
      thresholds: Seq[Double] = Seq(0.1, 0.2, 0.3, 0.4),
      embedder: Embedder = HashEmbedder(),
      tables: Seq[String] = Lake.lakeTables): DataFrame = {
    val cells = gridCells(spark, dir, groundTruth, ks, thresholds, embedder, tables)
    cells.foreach { cell =>
      val pairs = Discovery
        .toJoinablePairs(cell.discovered, "query", "candidate", "dist")
        .orderBy("distance_anns", "t1", "c1", "t2", "c2")
      graft.sources.Formats.csvSink(pairs,
        s"$outDir/pairs_k${cell.k}_t${cell.threshold}", singleFile = true)
    }
    val grid = cells.map(_.metrics).reduce(_.unionByName(_))
    graft.sources.Formats.csvSink(grid, s"$outDir/evaluation_results",
      singleFile = true)
    grid
  }
}
