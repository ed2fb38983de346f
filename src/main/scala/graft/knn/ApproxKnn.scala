package graft.knn

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate kNN — the scale path beyond brute force (SURVEY.md §7.3.3;
  * reference analogue: the hnswlib index, DeepJoin/annIndex.py — we keep
  * the approximation CONTRACT (recall@k), not the algorithm, which is
  * single-machine graph state).
  *
  * Two pruning strategies, same output contract as [[KnnJoin]]
  * ((query_id, neighbor_id, dist, rank), ties by id):
  *
  *  - [[lshKnn]]: random-hyperplane signatures, `tables` independent hash
  *    tables of `bits` bits. Only same-bucket pairs are scored — the join
  *    is a bucket equi-join, so work scales with bucket occupancy, never
  *    N². Good for cosine-like geometry.
  *
  *  - [[ivfKnn]]: inverted-file index. Coarse centroids are learned with
  *    k-means on a bounded driver-side sample (the only driver
  *    materialization, capped); every vector is assigned to its nearest
  *    centroid (distributed), queries probe the `nProbe` nearest centroid
  *    lists. Work scales with N·nProbe/nList.
  *
  * Both are deterministic (seeded) and verified against the exact kNN by
  * recall tests.
  */
object ApproxKnn {

  private def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Int)
      : Array[Array[Array[Float]]] = {
    val rnd = new Random(seed)
    Array.fill(tables, bits, dim)((rnd.nextGaussian()).toFloat)
  }

  /** LSH-bucketed kNN. `queries`/`candidates`: (id, vec) frames. */
  def lshKnn(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      metric: String = KnnJoin.MetricL2Sq,
      tables: Int = 8,
      bits: Int = 6,
      multiProbe: Boolean = true,
      seed: Int = 42,
      excludeSelf: Boolean = true): DataFrame = {
    // `probe=true` (query side only) additionally emits every signature at
    // Hamming distance 1 — classic multi-probe LSH: recall per table goes
    // from p^bits to P(≤1 bit differs) at the cost of (bits+1)× query rows
    // (queries are the small side; candidate storage is unchanged).
    // Signatures come from the native codegen LshBuckets expression (one
    // combined (table<<48)|sig long per bucket — table and signature were
    // only ever a compound join key); the former per-row Scala UDF boxed
    // every vector into Seq[Float] on the one path that touches all rows.
    val kernel = new org.apache.spark.sql.graft.LshKernel(
      hyperplanes(tables, bits, dim, seed))

    def bucketed(df: DataFrame, side: String, probe: Boolean) =
      graft.util.Par.balance(
        df.select(col(idCol).cast("long").as(s"${side}_id"),
          col(vecCol).as(s"__${side}_vec")))
        .withColumn("tb", explode(graft.functions.VectorExpressions
          .lshBuckets(col(s"__${side}_vec"), kernel, probe)))

    val q = bucketed(queries, "query", probe = multiProbe)
    val c = bucketed(candidates, "neighbor", probe = false)
    val joined = q.join(c, Seq("tb"))
    val filtered =
      if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id"))
      else joined

    val dist = metric match {
      case KnnJoin.MetricL2Sq =>
        graft.functions.VectorExpressions.squaredL2(col("__query_vec"), col("__neighbor_vec"))
      case KnnJoin.MetricCosine =>
        graft.functions.VectorExpressions.cosineDistance(col("__query_vec"), col("__neighbor_vec"))
      case m => throw new IllegalArgumentException(s"unknown metric: $m")
    }
    // score INSIDE the bucket join projection, then dedupe the multi-table /
    // multi-probe collisions on scalars only — the dedup shuffle carries
    // (q, c, dist), never the vectors (they'd dominate shuffle bytes)
    HnswSearch.topKMerge(
      filtered
        .withColumn("dist", dist)
        .groupBy("query_id", "neighbor_id").agg(min("dist").as("dist")),
      k)
  }

  /** The standard IVF list-sizing rule: nList = max(16, ⌈√n⌉), so each
    * inverted list holds ~√n vectors and a constant-nProbe search does
    * O(nProbe·√n) candidate work per query. Shared by every auto-sizing
    * sentinel (gridKnn escalation, IvfIndex build/rebalance).
    */
  private[graft] def autoNList(n: Long): Int =
    math.max(16, math.ceil(math.sqrt(math.max(0L, n).toDouble)).toInt)

  /** Driver-side mini k-means over a bounded sample (Lloyd iterations).
    * Deterministic: seeded sample, fixed iteration count. For cluster
    * counts beyond the sample cap (the 100 TB IVF/SemDeDup operating
    * point, 10⁴–10⁵ lists), use [[KMeans.train]] — the distributed
    * trainer with the same Lloyd contract.
    */
  private[graft] def kmeans(sample: Array[Array[Float]], nList: Int, iters: Int,
      seed: Int): Array[Array[Float]] = {
    val rnd = new Random(seed)
    // seed from DISTINCT vectors ([[KMeans.train]]'s dropDuplicates
    // contract): a duplicate-heavy sample would otherwise seed the same
    // point as several centroids — ties assign to the lowest index, the
    // clones never receive rows, and the effective list count silently
    // collapses. Like the distributed trainer, a sample with fewer than
    // nList distinct vectors yields that many centroids.
    val init = rnd.shuffle(sample.toVector).distinctBy(_.toSeq)
      .take(nList).map(_.clone()).toArray
    lloydDriver(sample, init, iters)
  }

  /** The Lloyd iteration body given explicit initial centroids — the
    * driver half of the trainer-parity contract with
    * [[KMeans.lloyd]] (same assignment rule, same double-accumulated
    * float arithmetic; the distributed form differs only in summation
    * order, i.e. float rounding).
    */
  private[graft] def lloydDriver(sample: Array[Array[Float]],
      init: Array[Array[Float]], iters: Int): Array[Array[Float]] = {
    val dim = sample.head.length
    var centroids = init
    for (_ <- 1 to iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var cIdx = 0
        while (cIdx < centroids.length) {
          var d = 0.0
          var i = 0
          while (i < dim) {
            val x = v(i) - centroids(cIdx)(i); d += x * x; i += 1
          }
          if (d < bestD) { bestD = d; best = cIdx }
          cIdx += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { cIdx =>
        if (counts(cIdx) == 0) centroids(cIdx)
        else {
          val c = new Array[Float](dim)
          var i = 0
          while (i < dim) { c(i) = (sums(cIdx)(i) / counts(cIdx)).toFloat; i += 1 }
          c
        }
      }.toArray
    }
    centroids
  }

  /** Unit-normalize a (id, vec) projection — the cosine→L2 reduction:
    * for unit vectors, cosine distance = squared L2 / 2 (exactly, up to
    * float rounding), with identical ranking. The norm is materialized as
    * its own column BEFORE the division lambda (codegen CSE skips lambda
    * bodies — an inline norm would recompute the dot product per
    * element). Zero vectors pass through unnormalized and keep a
    * `zeroAlias` flag: the engine-wide convention (cosineDistance,
    * HnswGraph) scores any pair involving a zero vector at distance 1.0,
    * which the normalized-L2 form cannot express (it would yield 0.5).
    */
  private[graft] def unitNormalized(df: DataFrame, idCol: String, vecCol: String,
      idAlias: String, vecAlias: String, zeroAlias: String): DataFrame =
    df.select(col(idCol).cast("long").as(idAlias),
        col(vecCol).cast("array<float>").as(vecAlias))
      .withColumn("__norm", sqrt(
        graft.functions.VectorExpressions.dotProduct(col(vecAlias), col(vecAlias))))
      .withColumn(zeroAlias, !(col("__norm") > 0))
      .withColumn(vecAlias,
        when(!col(zeroAlias),
          transform(col(vecAlias), x => (x / col("__norm")).cast("float")))
          .otherwise(col(vecAlias)))
      .drop("__norm")

  /** IVF kNN: centroid training on a sampled subset, distributed assign +
    * probe. `sampleCap` bounds the driver materialization. Cosine runs as
    * spherical IVF — both sides unit-normalized, centroids trained on the
    * sphere, `dist` emitted as true cosine distance (normalized-L2 / 2).
    *
    * `distributedTrain` switches centroid training from the driver-Lloyd
    * sample path to [[KMeans.train]] over the FULL candidate side —
    * required when `nList` exceeds what a `sampleCap` sample can support
    * (the 10⁴–10⁵-list operating point); the driver then materializes
    * only the k trained centroids, never a vector sample.
    */
  def ivfKnn(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nList: Int = 16,
      nProbe: Int = 4,
      metric: String = KnnJoin.MetricL2Sq,
      kmeansIters: Int = 5,
      sampleCap: Int = 20000,
      seed: Int = 42,
      excludeSelf: Boolean = true,
      distributedTrain: Boolean = false): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    require(nProbe > 0, s"ivfKnn: nProbe must be positive, got $nProbe")
    val cosine = HnswSearch.isCosine(metric)

    val cand =
      if (cosine) unitNormalized(candidates, idCol, vecCol,
        "neighbor_id", "__neighbor_vec", "__neighbor_zero")
      else candidates.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("__neighbor_vec"))
    val qry =
      if (cosine) unitNormalized(queries, idCol, vecCol,
        "query_id", "__query_vec", "__query_zero")
      else queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("__query_vec"))

    // cosine: zero vectors pass through unitNormalized UNnormalized (the
    // distance-1.0 convention handles them) — keep them out of the kmeans
    // sample, or raw zeros pull spherical centroids off the unit sphere
    // and zero-vector queries probe arbitrary lists
    val sampleSrc = if (cosine) cand.filter(!col("__neighbor_zero")) else cand
    val centroids =
      if (distributedTrain) {
        val nz = sampleSrc.select(col("__neighbor_vec"))
        // all-zero candidate side under cosine: every distance is 1.0
        // anyway — train on the zeros rather than fail
        val src = if (cosine && nz.isEmpty) cand.select(col("__neighbor_vec")) else nz
        KMeans.train(src, "__neighbor_vec", nList, kmeansIters, seed, "ivfKnn")
      } else {
        // seeded hash-ordered take (the ShapeStats sampling rule) — a
        // bare limit() reads a storage prefix, which under distribution
        // drift trains the quantizer on one regime (see
        // IvfIndex.collectSample for the full argument)
        def draw(df: DataFrame): Array[Array[Float]] = df
          .orderBy(xxhash64(col("neighbor_id"), lit(seed)),
            col("neighbor_id"))
          .limit(sampleCap)
          .select(col("__neighbor_vec").cast("array<float>"))
          .as[Array[Float]].collect()
        val sample0 = draw(sampleSrc)
        // all-zero candidate side: every distance is 1.0 anyway — train on
        // the zeros rather than fail
        val sample = if (sample0.nonEmpty) sample0 else draw(cand)
        require(sample.nonEmpty, "ivfKnn: empty candidate side")
        kmeans(sample, math.min(nList, sample.length), kmeansIters, seed)
      }
    // assign/probe run the native codegen nearest-centroid expressions over
    // the broadcast codebook — the assign touches EVERY candidate row, so
    // the former Scala UDF (boxed Seq[Float], interpreted, codegen barrier)
    // was the layer's one interpreter-bound inner loop
    val kernel = new org.apache.spark.sql.graft.CentroidKernel(
      spark.sparkContext.broadcast(centroids))

    val assigned = graft.util.Par.balance(cand)
      .withColumn("cid",
        graft.functions.VectorExpressions.nearestCentroid(col("__neighbor_vec"), kernel))

    val probed = graft.util.Par.balance(qry)
      .withColumn("cid", explode(graft.functions.VectorExpressions
        .nearestCentroids(col("__query_vec"), kernel, nProbe)))

    val joined = probed.join(assigned, Seq("cid"))
    val pairs =
      (if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id"))
       else joined)
    val l2 = graft.functions.VectorExpressions.squaredL2(
      col("__query_vec"), col("__neighbor_vec"))
    val cosDist = // zero-vector convention: distance 1.0 (see unitNormalized)
      when(col("__query_zero") || col("__neighbor_zero"), lit(1.0))
        .otherwise(l2 / 2.0)
    HnswSearch.topKMerge(
      pairs
        .withColumn("dist", if (cosine) cosDist else l2)
        .select("query_id", "neighbor_id", "dist"),
      k)
  }

  /** Block-partitioned exact kNN for the case where BOTH sides are too
    * large to broadcast at once: the query side is processed in bounded
    * blocks, each block broadcast against the full candidate side, results
    * unioned. Wall-clock scales linearly in blocks; memory stays bounded.
    *
    * Block boundaries come from a distributed `approxQuantile` sketch over
    * the id column — NOT a global ranking window, which would sort every
    * query id through one reducer. Boundaries partition the id line
    * exactly (every id lands in exactly one block), so the result is still
    * EXACT kNN; only the per-block row counts are approximate (quantile
    * error), which affects memory headroom, not correctness. Ids above
    * 2^53 lose precision through the Double quantile API — the id space
    * contract here is the same as Spark's own sampling-based range
    * partitioner.
    */
  def blockKnn(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      metric: String = KnnJoin.MetricL2Sq,
      blockSize: Int = 100000,
      excludeSelf: Boolean = true): DataFrame = {
    // null-id queries are dropped ONCE, up front, so every path agrees:
    // the multi-block path's block filters would silently exclude them
    // anyway, the single-block path would NPE decoding them, and an
    // all-null frame now fails broadcastKnn's loud empty-query require
    // instead of an opaque empty-union error
    val qs = queries.filter(col(idCol).isNotNull)
    val n = qs.count()
    val nBlocks = math.max(1L, (n + blockSize - 1) / blockSize).toInt
    if (nBlocks == 1)
      return KnnJoin.broadcastKnn(qs, candidates, idCol, vecCol, k,
        metric, excludeSelf)
    val bounds = idBlockBounds(qs, idCol, nBlocks)
    // Quantile rank error can leave an edge block with NO ids once it
    // approaches the block width (large n × coarse relErr) — and
    // broadcastKnn treats an empty query side as caller error. One scan
    // finds which blocks actually hold ids (block index of an id = how
    // many cuts are ≤ it); empty blocks are skipped, which is exact: an
    // empty block contributes no queries, hence no result rows.
    //
    // The presence predicate and idBlock's per-block filters MUST
    // evaluate the same comparison over the same RAW column: block index
    // of an id = number of cuts c with id >= c, exactly mirroring
    // idBlock's half-open [lo, hi) bounds. A casted copy here can
    // disagree with the raw comparison there (a negative fractional id
    // truncates toward zero under cast("long")), marking a block present
    // that idBlock then empties — re-triggering the empty-query
    // broadcastKnn failure this scan exists to prevent.
    val cuts = bounds.flatMap(_._1)
    val cutArr = array(cuts.map(lit(_)): _*)
    val present = qs
      .select(size(filter(cutArr, c => col(idCol) >= c)).as("b"))
      .groupBy("b").count().collect().map(_.getInt(0)).toSet
    val parts = bounds.zipWithIndex.collect {
      case ((lo, hi), i) if present(i) =>
        KnnJoin.broadcastKnn(idBlock(qs, idCol, lo, hi), candidates,
          idCol, vecCol, k, metric, excludeSelf)
    }
    // n > 0 puts every surviving id in exactly one block, so parts is
    // provably non-empty — this is a guard against that invariant
    // breaking, not a reachable path (pqBlockKnn's contract)
    require(parts.nonEmpty, "blockKnn: no non-empty query blocks")
    unionChunked(parts)
  }

  /** Union many per-block top-k results with a bounded-lineage
    * guarantee: every `chunk` frames, the running union is eagerly
    * `localCheckpoint`ed, so a 1000-block catalog (10⁸ ids / 10⁵
    * blockSize) yields a plan of ~nBlocks/chunk checkpointed leaves
    * instead of a 1000-deep Union lineage that Catalyst must re-analyze
    * on every action. Per-block results are top-k-sized (≤ blockSize × k
    * rows), so the materialized chunks are small by construction; at
    * ≤ chunk blocks — every plausible near-term catalog — no checkpoint
    * happens and the fold is the plain union it always was.
    */
  private[graft] def unionChunked(parts: Seq[DataFrame],
      chunk: Int = 32): DataFrame = {
    val grouped = parts.grouped(chunk).map(_.reduce(_.unionByName(_))).toSeq
    if (grouped.size == 1) grouped.head
    else grouped.map(_.localCheckpoint()).reduce(_.unionByName(_))
  }

  /** Quantile-cut id-line block boundaries shared by [[blockKnn]] and
    * [[pqBlockKnn]]: (lower, upper) half-open ranges partitioning the id
    * line exactly (every id lands in exactly one block) from a
    * distributed `approxQuantile` sketch — never a global ranking window.
    */
  private def idBlockBounds(queries: DataFrame, idCol: String,
      nBlocks: Int): Seq[(Option[Long], Option[Long])] = {
    val probs = (1 until nBlocks).map(_.toDouble / nBlocks).toArray
    val cuts = queries.select(col(idCol).cast("double").as("__id"))
      .stat.approxQuantile("__id", probs, 0.001)
      .map(math.ceil(_).toLong).distinct.sorted
    val lowers: Seq[Option[Long]] = None +: cuts.map(Some(_)).toSeq
    val uppers: Seq[Option[Long]] = cuts.map(Some(_)).toSeq :+ None
    lowers.zip(uppers)
  }

  private def idBlock(df: DataFrame, idCol: String,
      lo: Option[Long], hi: Option[Long]): DataFrame = (lo, hi) match {
    case (None, Some(h))    => df.filter(col(idCol) < h)
    case (Some(l), Some(h)) => df.filter(col(idCol) >= l && col(idCol) < h)
    case (Some(l), None)    => df.filter(col(idCol) >= l)
    case (None, None)       => df
  }

  /** Product-quantized kNN (FAISS `IndexPQ` contract): candidates are
    * compressed to `m`-byte PQ codes (32× smaller than 64-d float vectors
    * — the memory/shuffle story when even ids+vectors no longer fit), the
    * query side stays un-quantized, and distances come from ADC — a
    * per-query `m × ksub` lookup table built once per partition, then `m`
    * byte-indexed reads per candidate. One `mapPartitions` pass over the
    * codes keeps bounded per-query top-(rerank·k) partials (the
    * broadcastKnn shuffle shape: no N² rows ever move).
    *
    * `rerank > 0` re-scores the top `rerank·k` ADC survivors per query
    * with EXACT distances against the original vectors (narrow pair rows
    * join back to the candidate table — the standard PQ short-list
    * refinement), recovering near-exact recall@k while the full scan
    * still reads only codes. `rerank = 0` returns raw ADC distances.
    *
    * Cosine runs spherical (both sides unit-normalized, ADC-L2 / 2 ≈
    * cosine distance), zero vectors score 1.0 — the ivfKnn conventions.
    * Deterministic; same output contract as the other strategies.
    */
  def pqKnn(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      metric: String = KnnJoin.MetricL2Sq,
      m: Int = 8,
      ksub: Int = 256,
      rerank: Int = 4,
      kmeansIters: Int = 5,
      sampleCap: Int = 20000,
      seed: Int = 42,
      excludeSelf: Boolean = true): DataFrame = {
    val cosine = HnswSearch.isCosine(metric)
    val (cand, qry, bcBooks, kernel) = pqPrepare(queries, candidates,
      idCol, vecCol, cosine, m, ksub, kmeansIters, sampleCap, seed, "pqKnn")

    val qRows = collectPqQueries(qry)
    require(qRows.nonEmpty, "pqKnn: empty query side")

    // the full-corpus scan reads (id, m-byte code, zero flag) — vectors
    // are gone from the hot path after the encode projection
    val codes = pqCodes(cand, kernel)

    val keep = k * math.max(1, rerank)
    val shortList = HnswSearch.topKMerge(
      pqAdcPartials(codes, bcBooks, qRows, keep, excludeSelf, cosine), keep)
    if (rerank <= 0) shortList.filter(col("rank") <= k)
    else pqExactRerank(shortList, queries, candidates, idCol, vecCol, k,
      cosine, broadcastQueries = true)
  }

  /** [[pqKnn]]/[[pqBlockKnn]] shared preamble: the normalized
    * (candidates, queries) frames plus the trained codebook broadcast
    * and its ADC kernel — ONE definition, because the blocked variant's
    * recall contract is "identical codebooks: the trainer sees the same
    * sample regardless of blocking", which two drifting copies cannot
    * guarantee. An all-zero cosine candidate side trains on the zeros
    * rather than fail (the [[ivfKnn]] convention — the distance-1.0
    * zero-vector rule makes every such pair well-defined anyway, so a
    * strategy swap stays transparent).
    */
  private def pqPrepare(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      cosine: Boolean,
      m: Int,
      ksub: Int,
      kmeansIters: Int,
      sampleCap: Int,
      seed: Int,
      what: String): (DataFrame, DataFrame,
        org.apache.spark.broadcast.Broadcast[PqCodebooks],
        org.apache.spark.sql.graft.PqKernel) = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cand =
      if (cosine) unitNormalized(candidates, idCol, vecCol,
        "neighbor_id", "__neighbor_vec", "__neighbor_zero")
      else candidates.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("__neighbor_vec"), lit(false).as("__neighbor_zero"))
    val qry =
      if (cosine) unitNormalized(queries, idCol, vecCol,
        "query_id", "__query_vec", "__query_zero")
      else queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("__query_vec"), lit(false).as("__query_zero"))
    // seeded hash-ordered take (the ShapeStats sampling rule) — a bare
    // limit() reads a storage prefix, which under distribution drift
    // trains the codebooks on one regime (see IvfIndex.collectSample)
    def draw(df: DataFrame): Array[Array[Float]] = df
      .orderBy(xxhash64(col("neighbor_id"), lit(seed)), col("neighbor_id"))
      .limit(sampleCap)
      .select(col("__neighbor_vec").cast("array<float>"))
      .as[Array[Float]].collect()
    val sample0 = draw(cand.filter(!col("__neighbor_zero")))
    val sample = if (sample0.nonEmpty) sample0 else draw(cand)
    require(sample.nonEmpty, s"$what: empty candidate side")
    val books = Pq.train(sample, m, ksub, kmeansIters, seed)
    val bcBooks = spark.sparkContext.broadcast(books)
    (cand, qry, bcBooks, new org.apache.spark.sql.graft.PqKernel(bcBooks))
  }

  /** PQ-coded kNN for the case where BOTH sides are too large for the
    * [[pqKnn]] broadcast-query envelope: the query side is processed in
    * bounded quantile-cut id blocks (the [[blockKnn]] memory story) over
    * ONE shared codebook and ONE code scan — codes are encoded once and
    * lazily `localCheckpoint`ed, so each block's ADC pass re-reads the
    * materialized code partitions instead of re-encoding the corpus.
    * The exact short-list rerank runs ONCE over the unioned blocks with
    * shuffle joins: the full query side is never broadcast anywhere.
    * Same recall contract as [[pqKnn]] (identical codebooks: the trainer
    * sees the same sample regardless of blocking).
    */
  def pqBlockKnn(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      metric: String = KnnJoin.MetricL2Sq,
      m: Int = 8,
      ksub: Int = 256,
      rerank: Int = 4,
      kmeansIters: Int = 5,
      sampleCap: Int = 20000,
      seed: Int = 42,
      excludeSelf: Boolean = true,
      blockSize: Int = 100000): DataFrame = {
    val cosine = HnswSearch.isCosine(metric)
    val n = queries.count()
    val nBlocks = math.max(1L, (n + blockSize - 1) / blockSize).toInt
    if (nBlocks == 1)
      return pqKnn(queries, candidates, idCol, vecCol, k, metric, m, ksub,
        rerank, kmeansIters, sampleCap, seed, excludeSelf)

    val (cand, qry, bcBooks, kernel) = pqPrepare(queries, candidates,
      idCol, vecCol, cosine, m, ksub, kmeansIters, sampleCap, seed,
      "pqBlockKnn")
    // one code scan shared by every block: lazy materialization (the
    // setJaccardPairs rationale — constructing the plan must not run a
    // job), first block's job writes the checkpoint blocks, later blocks
    // read them
    val codes = pqCodes(cand, kernel).localCheckpoint(eager = false)

    val keep = k * math.max(1, rerank)
    val partials = idBlockBounds(qry, "query_id", nBlocks).flatMap { case (lo, hi) =>
      val qRows = collectPqQueries(idBlock(qry, "query_id", lo, hi))
      if (qRows.isEmpty) None
      else Some(pqAdcPartials(codes, bcBooks, qRows, keep, excludeSelf, cosine))
    }
    require(partials.nonEmpty, "pqBlockKnn: empty query side")
    val shortList = HnswSearch.topKMerge(unionChunked(partials), keep)
    if (rerank <= 0) shortList.filter(col("rank") <= k)
    else pqExactRerank(shortList, queries, candidates, idCol, vecCol, k,
      cosine, broadcastQueries = false)
  }

  /** Collect one (bounded) query block for the PQ broadcast: the caller
    * guarantees the block size envelope.
    */
  private def collectPqQueries(qry: DataFrame): Array[(Long, Array[Float], Boolean)] = {
    import qry.sparkSession.implicits._
    qry.select(col("query_id"), col("__query_vec").cast("array<float>"),
        col("__query_zero"))
      .as[(Long, Array[Float], Boolean)].collect()
  }

  /** The (id, m-byte code, zero flag) projection of a normalized
    * candidate side — the only thing the PQ scan ever reads.
    */
  private def pqCodes(cand: DataFrame,
      kernel: org.apache.spark.sql.graft.PqKernel)
      : org.apache.spark.sql.Dataset[(Long, Array[Byte], Boolean)] = {
    import cand.sparkSession.implicits._
    graft.util.Par.balance(cand)
      .select(col("neighbor_id"),
        graft.functions.VectorExpressions.pqEncode(col("__neighbor_vec"), kernel)
          .as("__code"),
        col("__neighbor_zero"))
      .as[(Long, Array[Byte], Boolean)]
  }

  /** One ADC pass of a broadcast query block over the code scan: per-query
    * LUT built once per partition, bounded per-partition top-`keep`
    * partials (the broadcastKnn shuffle shape — no N² rows ever move).
    */
  private def pqAdcPartials(
      codes: org.apache.spark.sql.Dataset[(Long, Array[Byte], Boolean)],
      bcBooks: org.apache.spark.broadcast.Broadcast[PqCodebooks],
      qRows: Array[(Long, Array[Float], Boolean)],
      keep: Int,
      excludeSelf: Boolean,
      cosine: Boolean): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val bcQ = spark.sparkContext.broadcast(qRows)
    val (kL, ex, cos) = (keep, excludeSelf, cosine)
    codes.mapPartitions { it =>
      val cb = bcBooks.value
      val q = bcQ.value
      val n = q.length
      val qIds = new Array[Long](n)
      val qZero = new Array[Boolean](n)
      val luts = new Array[Array[Float]](n)
      var i = 0
      while (i < n) {
        qIds(i) = q(i)._1; qZero(i) = q(i)._3
        luts(i) = cb.adcTable(q(i)._2)
        i += 1
      }
      val heaps = Array.fill(n)(new org.apache.spark.sql.graft.TopKBuf(kL))
      it.foreach { case (cid, code, czero) =>
        var j = 0
        while (j < n) {
          if (!(ex && qIds(j) == cid)) {
            val d =
              if (cos && (qZero(j) || czero)) 1.0
              else if (cos) cb.adcDist(code, luts(j)) / 2.0
              else cb.adcDist(code, luts(j))
            heaps(j).offer(d, cid)
          }
          j += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        (0 until h.size).iterator.map(r => (qIds(qi), h.ids(r), h.dists(r)))
      }
    }.toDF("query_id", "neighbor_id", "dist")
  }

  /** Exact refinement of an ADC short list: narrow (q, c) pair rows join
    * back to the vector tables. The candidate join is a plain shuffle
    * join on 8-byte ids; `broadcastQueries` hints the query-vector side
    * only on the single-broadcast path — the block path (query side too
    * large to broadcast by definition) shuffles both.
    */
  /** Truncated-dimension kNN — the Matryoshka/prefix-search shape
    * (Kusupati et al., NeurIPS 2022: MRL embeddings front-load
    * information into the leading components; OpenAI's `dimensions`
    * parameter is the same contract). Stage 1 ranks on the first
    * `truncDim` components only, cutting the candidate pass's scan,
    * broadcast, and distance-kernel cost by truncDim/dim; an exact
    * full-dimension rerank over the k·`rerank` short list restores
    * precision. Recall follows the energy the prefix carries — near-1
    * for MRL-trained embeddings, lower for raw ones (the SparkEntry gate
    * measures the raw case as the adversarial floor). `rerank` trades
    * stage-2 width for recall exactly like [[pqKnn]]'s short list.
    *
    * Same contract as every kNN strategy here: deterministic
    * (query_id, neighbor_id, dist, rank), dist exact in full dimension.
    */
  def truncatedKnn(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      truncDim: Int,
      metric: String = KnnJoin.MetricL2Sq,
      rerank: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    require(truncDim > 0, s"truncatedKnn: truncDim must be positive, got $truncDim")
    val cosine = HnswSearch.isCosine(metric)
    def trunc(df: DataFrame) = df.select(col(idCol),
      slice(col(vecCol), 1, truncDim).as(vecCol))
    val keep = k * math.max(1, rerank)
    val shortList = KnnJoin.broadcastKnn(trunc(queries), trunc(candidates),
      idCol, vecCol, keep, metric, excludeSelf)
    pqExactRerank(shortList, queries, candidates, idCol, vecCol, k,
      cosine, broadcastQueries = true)
  }

  private def pqExactRerank(
      shortList: DataFrame,
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cosine: Boolean,
      broadcastQueries: Boolean): DataFrame = {
    val qv0 = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("__qv"))
    val qv = if (broadcastQueries) broadcast(qv0) else qv0
    val cv = candidates.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("__cv"))
    val exact = shortList.select("query_id", "neighbor_id")
      .join(qv, "query_id")
      .join(cv, "neighbor_id")
      .withColumn("dist",
        if (cosine) graft.functions.VectorExpressions.cosineDistance(col("__qv"), col("__cv"))
        else graft.functions.VectorExpressions.squaredL2(col("__qv"), col("__cv")))
      .select("query_id", "neighbor_id", "dist")
    HnswSearch.topKMerge(exact, k)
  }

  /** Graph-based ANN: sharded HNSW (the reference's hnswlib contract,
    * DeepJoin/annIndex.py:12–40, distributed the standard way). Each
    * candidate PARTITION builds an independent [[HnswGraph]] in one
    * `mapPartitions` pass — graphs are memory-bounded by partition size
    * and never serialized or shuffled — the broadcast query set beams
    * through every shard (`efSearch`), and the per-shard top-k partials
    * merge in one ranking window, exactly the broadcastKnn shuffle shape.
    * Per-shard search is sublinear in partition size, so total query work
    * scales with `partitions · ef · log n_p` instead of N.
    *
    * Deterministic (seeded levels, index-tie-broken heaps, same contract
    * as the other strategies): (query_id, neighbor_id, dist, rank).
    */
  /** HNSW kNN for the case where the QUERY side is too large to
    * broadcast at once — the flagship grid's self-kNN, where queries ==
    * candidates == the whole catalog. [[hnswKnn]] rebuilds its
    * per-partition graphs inside every call's `mapPartitions`, so
    * blocking the query side over it would pay the O(N·efC·M) graph
    * build once per block; here the sharded graphs are built ONCE into
    * a scratch [[HnswIndex]] (the persisted family — same graphs, same
    * beam, drift-gated by HnswIndexSpec/SCALE `hnsw_drift`), and the
    * query side streams through it in bounded id-blocks (the
    * [[blockKnn]] quantile-cut machinery), each block broadcast against
    * every shard's restored graph.
    *
    * Scale shape: per-query work is `shards · ef · M · log(N/shards)` —
    * the N·log N self-join, vs auto-√N IVF's Θ(N^1.5) — and, unlike the
    * IVF escalation, no candidate PAIR ROWS ever materialize into a
    * shuffle (the IVF path ships nProbe·N/nList vector pairs per query
    * through the cid join; the beam stays inside `mapPartitions` and
    * emits only top-k rows). Driver/broadcast memory is bounded by
    * `queryBlockSize` vectors per block; `shards` is a fixed parallelism
    * knob, so per-shard graph memory (N/shards nodes) is the scale LIMIT
    * of the full-fan-out design — grow shards past executor memory and
    * the `shards·ef` fan-out term takes over.
    *
    * `efSearch <= 0` means full beam (ef = candidate count, capped at
    * Int.MaxValue): every shard's whole connected graph is explored and
    * the merged top-k equals brute force — the oracle form (the q97
    * convention).
    */
  /** [[hnswBlockKnn]]'s scratch-dir placement guard, factored out so the
    * message is spec-testable without a non-local cluster: the DEFAULT
    * (owned) scratch dir is a driver-local temp path, which executors on
    * any non-local master cannot read — the build would scatter graph
    * files across machine-local disks and the search would restore
    * nothing. Refuse loudly instead.
    */
  private[graft] def requireLocalScratch(master: String, owned: Boolean): Unit =
    require(!owned || master.startsWith("local"),
      s"hnswBlockKnn: the default scratchDir is DRIVER-LOCAL temp space, " +
        s"which executors under master '$master' cannot read — pass a " +
        "shared-filesystem scratchDir (hdfs:/s3a:/...) on non-local " +
        "deployments")

  def hnswBlockKnn(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      metric: String = KnnJoin.MetricL2Sq,
      m: Int = 16,
      efConstruction: Int = 100,
      efSearch: Int = 64,
      shards: Int = 32,
      queryBlockSize: Int = 100000,
      excludeSelf: Boolean = true,
      seed: Int = 42,
      scratchDir: Option[String] = None): DataFrame = {
    val spark = candidates.sparkSession
    // an owned (caller-unspecified) scratch dir is deleted as soon as the
    // result is materialized below — a long-lived driver calling the HNSW
    // grid tier repeatedly must not accumulate one on-disk graph copy per
    // call until JVM exit (TempDirs stays registered as the crash
    // backstop). A caller-provided scratchDir is caller-owned: left in
    // place, results returned lazy over it. NOTE the default is a
    // DRIVER-LOCAL temp path — fine in local mode; on a real cluster pass
    // a shared-FS scratchDir (the graphs are written and re-read through
    // the Hadoop FS API, so any hdfs:/s3a: path works) — the guard below
    // REFUSES the default off local masters rather than letting executors
    // silently write graphs to a path only the driver can see. The owned
    // path also makes the result EAGER via localCheckpoint (see finish):
    // the checkpointed blocks are unreplicated executor state, so on a
    // non-local deployment a lost executor makes the returned frame
    // unrecoverable — a second reason the owned default is scoped to
    // local mode, and a caller-provided shared-FS scratchDir keeps the
    // result lazily recomputable instead.
    val owned = scratchDir.isEmpty
    requireLocalScratch(spark.sparkContext.master, owned)
    val dir = scratchDir.getOrElse {
      val d = java.nio.file.Files.createTempDirectory("graft_hnsw_block")
        .toString
      graft.util.TempDirs.register(d)
      d
    }
    // eager localCheckpoint when we own the scratch dir: every beam runs
    // NOW (the result is N·k top-k rows — bounded, and the grid caller
    // materializes it anyway), after which the graph files are dead
    // weight and can be deleted
    def finish(df: DataFrame): DataFrame =
      if (!owned) df
      else {
        val out = df.localCheckpoint()
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
        out
      }
    // efSearch is pinned (to the raw default — never served: every
    // search below passes the caller's resolved beam explicitly with
    // efAutoScale = false) so the scratch build SKIPS HnswIndex's
    // untuned-path shape probe: the grid gate already classified this
    // catalog before choosing the beam it passes here, and paying a
    // second full-catalog contrast pass per grid call — to resolve a
    // serving default nothing reads — would be pure waste
    HnswIndex.build(candidates, idCol, vecCol, dir, m = m,
      efConstruction = efConstruction, metric = metric, shards = shards,
      seed = seed, efSearch = HnswIndex.DefaultServeEf)
    val ef =
      if (efSearch > 0) efSearch
      else math.min(candidates.count(), Int.MaxValue.toLong).toInt
    // null-id queries are dropped once, up front — the blockKnn contract
    val qs = queries.filter(col(idCol).isNotNull)
    val n = qs.count()
    val nBlocks = math.max(1L, (n + queryBlockSize - 1) / queryBlockSize).toInt
    // efAutoScale = false: this is a RAW primitive — the resolved `ef`
    // is the caller's knob verbatim (the grid gate applies
    // graft.knn.BeamLaw BEFORE calling here; letting the scratch
    // index's search scale it again would double-apply the law)
    if (nBlocks == 1)
      return finish(HnswIndex.search(spark, dir, qs, idCol, vecCol, k, ef,
        excludeSelf, efAutoScale = false))
    val bounds = idBlockBounds(qs, idCol, nBlocks)
    // same presence scan as blockKnn: quantile rank error can empty an
    // edge block, and HnswIndex.search treats an empty query side as
    // caller error — see the blockKnn comment for the raw-column rule
    val cuts = bounds.flatMap(_._1)
    val cutArr = array(cuts.map(lit(_)): _*)
    val present = qs
      .select(size(filter(cutArr, c => col(idCol) >= c)).as("b"))
      .groupBy("b").count().collect().map(_.getInt(0)).toSet
    val parts = bounds.zipWithIndex.collect {
      case ((lo, hi), i) if present(i) =>
        HnswIndex.search(spark, dir, idBlock(qs, idCol, lo, hi), idCol,
          vecCol, k, ef, excludeSelf, efAutoScale = false)
    }
    require(parts.nonEmpty, "hnswBlockKnn: no non-empty query blocks")
    finish(unionChunked(parts))
  }

  def hnswKnn(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      metric: String = KnnJoin.MetricL2Sq,
      m: Int = 16,
      efConstruction: Int = 100,
      efSearch: Int = 64,
      seed: Int = 42,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cosine = HnswSearch.isCosine(metric)
    val bc = spark.sparkContext.broadcast(
      HnswSearch.collectQueries(queries, idCol, vecCol, "hnswKnn"))
    val (mL, efC, efS, kL, ex) = (m, efConstruction, efSearch, k, excludeSelf)

    val partials = graft.util.Par.balance(
      candidates.select(col(idCol).cast("long"), col(vecCol).cast("array<float>")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val g = new HnswGraph(mL, efC, cosine, seed)
        it.foreach { case (id, v) => g.insert(id, v) }
        if (g.size == 0) Iterator.empty
        else HnswSearch.beamAll(g, bc.value, kL, efS, ex)
      }
      .toDF("query_id", "neighbor_id", "dist")

    HnswSearch.topKMerge(partials, k)
  }
}

/** Shared query-side machinery for the in-memory ([[ApproxKnn.hnswKnn]])
  * and persisted ([[HnswIndex.search]]) HNSW paths — one implementation
  * of the beam body, the query broadcast, and the partial merge, so the
  * two paths cannot drift.
  */
private[knn] object HnswSearch {

  def isCosine(metric: String): Boolean = metric match {
    case KnnJoin.MetricCosine => true
    case KnnJoin.MetricL2Sq   => false
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  def collectQueries(queries: DataFrame, idCol: String, vecCol: String,
      what: String): Array[(Long, Array[Float])] = {
    import queries.sparkSession.implicits._
    val qRows = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    require(qRows.nonEmpty, s"$what: empty query side")
    qRows
  }

  /** Beam every query through one shard's graph: per-query top-k partials
    * with self-exclusion (search k+1, drop self, keep k).
    */
  def beamAll(g: HnswGraph, queries: Array[(Long, Array[Float])], k: Int,
      efSearch: Int, excludeSelf: Boolean): Iterator[(Long, Long, Double)] =
    queries.iterator.flatMap { case (qid, qv) =>
      g.search(qv, k + (if (excludeSelf) 1 else 0), math.max(efSearch, k + 1))
        .iterator
        .filter { case (nid, _) => !(excludeSelf && nid == qid) }
        .take(k)
        .map { case (nid, d) => (qid, nid, d) }
    }

  /** Merge per-shard/per-block partials into the global per-query top-k:
    * (query_id, neighbor_id, dist, rank), rank 1-based ascending by
    * (dist, neighbor_id) — every kNN strategy's one merge.
    *
    * Deliberately a ranking WINDOW, not a bounded top-k aggregate —
    * MEASURED, round 16, on the 200k-key grid tier (64M partial rows
    * through this merge; all three numbers from the ONE experiment
    * session — the committed SCALE_r16_default_gate records this same
    * window plan at 72.5 s in a separate session on the shared host,
    * so the claim is the within-session 1.42×/1.56× loss, not the
    * absolutes): window
    * 102.5 s end to end; a TypedImperativeAggregate top-k buffer
    * (BoundedTopK's shape on (dist, id) pairs) 145.8 s on the default
    * ObjectHashAggregate sort-fallback and 160.2 s with the fallback
    * threshold raised to pure hash. The window's per-partition sort is
    * whole-stage-codegen'd UnsafeRow radix sort + a streaming
    * row_number; the object aggregate pays interpreted per-row
    * `eval`, generic buffers and serde on every map-side row, and k·N
    * buffer inserts cost more than N·log N radix comparisons at these
    * k. A bounded aggregate only wins when per-group row counts are
    * UNBOUNDED (the profiler's near-unique-column case — BoundedTopK's
    * A2); here every shard emits exactly k rows per query, so the sort
    * input is already top-k-bounded and the window is the faster plan.
    */
  def topKMerge(partials: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(asc("dist"), asc("neighbor_id"))
    partials
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
