package graft.knn

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent IVF index (SURVEY.md S11, re-expressed Spark-native — the
  * reference serializes an in-process binary ANN index to disk and mmaps
  * it back, DeepJoin/annIndex.py; a single-machine byte blob has no
  * distributed analog, but the INDEX-AS-DATA layout does):
  *
  *  - `centroids/`  — (cid, vec): the trained coarse quantizer, tiny;
  *  - `assignments/` — (id, vec) parquet PARTITIONED BY cid: each inverted
  *    list is a partition directory, so a probe of `nProbe` lists becomes
  *    a partition-pruned scan that never touches the other lists' files;
  *  - `params/` — one row (n_list, metric, seed, n_at_train): like
  *    [[HnswIndex]]'s `params/`, the metric rides IN the index — search
  *    and append read it from disk, so a caller cannot probe a
  *    cosine-built index with L2; `n_at_train` anchors the [[staleness]]
  *    rebuild-cadence signal.
  *
  * Cosine runs as spherical IVF: the quantizer is trained on unit-
  * normalized vectors and both assign and probe normalize on the fly, but
  * the assignments store the ORIGINAL vectors — search emits true cosine
  * distance (dot/norms in double, [[graft.functions.VectorExpressions
  * .cosineDistance]]), bit-compatible with [[KnnJoin.broadcastKnn]]'s
  * cosine output. Zero vectors keep the engine-wide distance-1.0
  * convention through that expression.
  *
  * Build once, search many times from any session — the same contract as
  * the reference's save/load, with the probe pruning enforced by the
  * storage layout instead of an in-memory structure.
  */
object IvfIndex {

  /** The output schema of [[search]] — the one constant downstream code
    * (e.g. the streaming probe's empty-input branch) should derive empty
    * frames from, so shape changes cannot drift silently.
    */
  val searchSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("neighbor_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("dist",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType)))

  /** Train the coarse quantizer on a bounded sample and persist the index
    * layout. Returns the centroid count actually used.
    *
    * `pqM > 0` additionally trains product-quantization codebooks (FAISS
    * `IndexIVFPQ` contract: `pqM` subspaces × `pqKsub` centroids, see
    * [[Pq]]) on the same sample and stores an m-byte `code` column in
    * every list — [[search]] with `usePq = true` then scans codes
    * instead of vectors. `pqByResidual` (default, matching FAISS) makes
    * the codes quantize `v − coarseCentroid` instead of `v`: within a
    * list every vector shares the centroid offset, so the residual cloud
    * is far tighter than absolute positions and the same code budget
    * buys materially lower quantization error. Codebooks persist under
    * `pq/` as (s, c, vec, residual) rows; their absence marks a
    * vectors-only index.
    *
    * `nList <= 0` sizes the list count automatically as max(16, ⌈√N⌉)
    * over the candidate count ([[ApproxKnn.autoNList]]) — the standard
    * IVF rule; costs one extra count job, only on the sentinel path.
    * Auto sizing past the sample cap (N ≳ 4·10⁸ at the default cap)
    * still wants `distributedTrain` — the driver trainer clamps the
    * centroid count to the collected sample as before.
    */
  def build(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nList: Int = 16,
      metric: String = KnnJoin.MetricL2Sq,
      kmeansIters: Int = 5,
      sampleCap: Int = 20000,
      seed: Int = 42,
      pqM: Int = 0,
      pqKsub: Int = 256,
      pqByResidual: Boolean = true,
      distributedTrain: Boolean = false,
      twoLevelAssign: Boolean = false,
      twoLevelProbes: Int = 4): Int =
    // same single-writer lock as append/rebalance: a build racing a live
    // append would Overwrite lists the append is mid-commit on, silently
    // losing the append's rows
    graft.util.IndexLock.withLock(candidates.sparkSession, dir,
        "IvfIndex.build") {
      // one column-pruned count serves the auto-nList rule AND the
      // training-time corpus size persisted for [[staleness]]
      val nCand = candidates.count()
      val lists = if (nList > 0) nList else ApproxKnn.autoNList(nCand)
      buildLocked(candidates, idCol, vecCol, dir, lists, metric, kmeansIters,
        sampleCap, seed, pqM, pqKsub, pqByResidual, distributedTrain,
        twoLevelAssign, twoLevelProbes, nCand)
    }

  private def buildLocked(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nList: Int,
      metric: String,
      kmeansIters: Int,
      sampleCap: Int,
      seed: Int,
      pqM: Int,
      pqKsub: Int,
      pqByResidual: Boolean,
      distributedTrain: Boolean,
      twoLevelAssign: Boolean,
      twoLevelProbes: Int,
      nAtTrain: Long): Int = {
    val spark = candidates.sparkSession
    import spark.implicits._
    // a crashed rebalance/build must not leak staged tables into this
    // build's staging (a stale assignments.tmp would roll "forward" over
    // the fresh index at the next writer entry)
    recoverSwap(spark, dir)
    val cosine = HnswSearch.isCosine(metric)
    // spherical kmeans trains on unit vectors, excluding raw zeros (a raw
    // zero would pull a centroid off the sphere; the distance-1.0
    // convention makes zero vectors list-agnostic anyway)
    val sampleSrc =
      if (cosine) ApproxKnn.unitNormalized(candidates, idCol, vecCol,
        "__id", "__vec", "__zero").filter(!col("__zero"))
        .select(col("__id"), col("__vec"))
      else candidates.select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<float>").as("__vec"))
    def collectSample(): Array[Array[Float]] = {
      // seeded hash-ordered take (the ShapeStats sampling rule:
      // TakeOrderedAndProject, uniform across the catalog, deterministic
      // across layouts) — the former bare limit() was a storage-prefix
      // read, which on a time-ordered corpus under distribution drift
      // trains the quantizer on the OLDEST regime only, the sampling
      // twin of the HNSW id-ordered-insertion hazard
      def draw(df: DataFrame): Array[Array[Float]] = df
        .orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
        .limit(sampleCap)
        .select(col("__vec")).as[Array[Float]].collect()
      val sample0 = draw(sampleSrc)
      // all-zero candidate side under cosine: every distance is 1.0 anyway —
      // train on the zeros rather than fail
      val sample = if (sample0.nonEmpty) sample0
        else draw(candidates.select(col(idCol).cast("long").as("__id"),
          col(vecCol).cast("array<float>").as("__vec")))
      require(sample.nonEmpty, "IvfIndex.build: empty candidate side")
      sample
    }
    // `distributedTrain` lifts the coarse quantizer onto [[KMeans.train]]
    // over the full candidate side — nList beyond the sample cap (the
    // 10⁴–10⁵-list operating point) with only the k centroids ever on the
    // driver. PQ codebooks (ksub ≤ 256 by the byte-code format) stay on
    // the bounded sample either way.
    val driverSample: Option[Array[Array[Float]]] =
      if (distributedTrain && pqM <= 0) None else Some(collectSample())
    val centroids =
      if (distributedTrain) {
        val src = if (cosine && sampleSrc.isEmpty)
          candidates.select(col(vecCol).cast("array<float>").as("__vec"))
        else sampleSrc
        KMeans.train(src, "__vec", nList, kmeansIters, seed, "IvfIndex.build")
      } else {
        val sample = driverSample.get
        ApproxKnn.kmeans(sample, math.min(nList, sample.length), kmeansIters, seed)
      }

    // ONE broadcast of the coarse codebook per build: shared by the
    // residual-sample probe below and writeAssignments' kernels — each
    // executor caches a single copy
    val bcCentroids = spark.sparkContext.broadcast(centroids)
    // all four tables are STAGED as <table>.tmp and committed by the
    // same marker-protected swap as rebalance: a rebuild-in-place that
    // overwrote the live tables sequentially could crash between the
    // centroids write and the assignments write, leaving a NEW quantizer
    // over OLD lists — probe cids computed against centroids the
    // persisted cid values were never assigned under, and recall
    // silently collapses with no error raised
    centroids.zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq.toDF("cid", "vec")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids.tmp")
    // n_at_train: the corpus size the quantizer (and codebooks, if any)
    // trained on — the denominator-anchor [[staleness]] reports drift
    // against. A fresh build trains everything, so it IS the corpus size.
    Seq((centroids.length, metric, seed, Some(nAtTrain): Option[Long]))
      .toDF("n_list", "metric", "seed", "n_at_train")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/params.tmp")

    // PQ codebooks train on the same (assign-space) sample: under cosine
    // the sample is already unit-normalized, so codes quantize the sphere
    // the distances are measured on. Residual mode trains on
    // v − nearestCoarseCentroid(v) — the cloud the codes will actually
    // quantize at write time.
    val pq =
      if (pqM <= 0) None
      else {
        // the SAME kernel arithmetic as the distributed write-time assign
        // (one source of truth for the assignment rule — a private
        // re-implementation could drift and silently degrade codebooks)
        val probe = new org.apache.spark.sql.graft.CentroidKernel(bcCentroids)
        val sample = driverSample.get
        val trainSample =
          if (!pqByResidual) sample
          else sample.map { v =>
            val c = centroids(probe.nearestOne(
              new org.apache.spark.sql.catalyst.util.GenericArrayData(v)))
            val r = new Array[Float](v.length)
            var i = 0
            while (i < v.length) {
              r(i) = v(i) - (if (i < c.length) c(i) else 0.0f); i += 1
            }
            r
          }
        Some((Pq.train(trainSample, pqM, pqKsub, kmeansIters, seed),
          pqByResidual))
      }
    pq.foreach { case (cb, residual) =>
      (for { s <- 0 until cb.m; c <- 0 until cb.ksub }
        yield (s, c, cb.centroids(s)(c), residual))
        .toDF("s", "c", "vec", "residual")
        .repartition(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/pq.tmp")
    }
    // pqM <= 0 stages nothing for pq/: the live table (if a previous
    // build wrote one) is deleted inside the marker window below — a
    // surviving stale codebook would make append() re-add codes with
    // books trained on data this build replaced

    // twoLevelAssign: sublinear per-row assign for large nList (the
    // 10⁴–10⁵-list build path) — see KMeans.twoLevelIndex. Approximate
    // at cell boundaries; list membership shifts, search stays exact
    // within probed lists. Append keeps the exact assign (a mode mismatch
    // only perturbs list balance, but defaults should round-trip).
    val assignKernel: org.apache.spark.sql.graft.CentroidIndex =
      if (twoLevelAssign) KMeans.twoLevelIndex(spark, centroids,
        twoLevelProbes, seed = seed)
      else new org.apache.spark.sql.graft.CentroidKernel(bcCentroids)
    writeAssignments(candidates, idCol, vecCol, dir, bcCentroids, cosine, pq,
      SaveMode.Overwrite, assignKernel, table = "assignments.tmp")

    // intent marker (carrying the BUILD op so crash recovery knows to
    // also clear the stale pq table and the ingest state), then the
    // swaps it protects — identical protocol to rebalance
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(s"$dir/$CommitMarker")
    // atomic publish (temp + rename): a torn marker would read as the
    // empty REBALANCE format and recovery would skip the build's
    // post-swap obligations
    graft.util.StagedTables.writeMarker(fs, dir, CommitMarker,
      if (pq.isEmpty) MarkerBuildClearPq else MarkerBuild)
    swapStaged(fs, dir)
    if (pq.isEmpty) fs.delete(new Path(s"$dir/pq"), true)
    // the previous build's displacement anchor describes codebooks this
    // build just replaced — delete it INSIDE the marker window (recovery
    // replays the delete), so no crash point leaves the new index
    // alarmed against a dead anchor. The fresh anchor is measured after
    // the commit; a crash before that write leaves an anchor-less index
    // (ratio columns null — the honest legacy state), never a stale one.
    deleteAnchor(fs, dir)
    // fresh corpus → fresh ingest state (graft.util.IngestState
    // contract); inside the marker window so a crash here replays the
    // clear on recovery instead of leaving the NEW index gated by the
    // previous corpus's high-water mark
    graft.util.IngestState.clear(spark, dir)
    fs.delete(marker, false)
    // the post-build displacement ANCHOR ([[staleness]]'s operating
    // rule): measured on the just-committed index at the staleness
    // probe's defaults and persisted beside the training-time corpus
    // size, so [[staleness]] can emit `displacement_ratio` and
    // `rebuild_due` from index state alone — the r18 artifact's alarm
    // required the operator to have kept this number themselves
    pq.foreach { p =>
      // the build holds every piece of metadata the probe needs — no
      // re-reads of the tables it just wrote
      measureAdcDisplacement(spark, dir, nAtTrain,
        AnchorProbeQueries, AnchorK, AnchorNProbe, AnchorRerank, AnchorSeed,
        pre = Some((centroids, metric, Some(p))))
        .foreach(d => writeAnchor(spark, fs, dir, d))
    }
    centroids.length
  }

  /** Distributed assign + partitioned write shared by [[build]] and
    * [[append]]. The nearest-centroid assign runs the native codegen
    * expression over the broadcast codebook — it touches EVERY row, the
    * one loop that matters at 100 TB build time. Under cosine the assign
    * sees the unit-normalized copy of each vector (the quantizer lives on
    * the sphere) while the ORIGINAL vector is what lands in the list.
    */
  private def writeAssignments(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      bcCentroids: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]],
      cosine: Boolean,
      pq: Option[(PqCodebooks, Boolean)],
      mode: SaveMode,
      kernel: org.apache.spark.sql.graft.CentroidIndex,
      table: String = "assignments"): Unit = {
    val spark = vectors.sparkSession
    val base = graft.util.Par.balance(
      vectors.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec")))
    val assignVec =
      if (!cosine) col("vec")
      else {
        val norm = sqrt(graft.functions.VectorExpressions
          .dotProduct(col("vec"), col("vec")))
        when(norm > 0, transform(col("vec"), x => (x / norm).cast("float")))
          .otherwise(col("vec"))
      }
    val withCid = base.withColumn("cid",
      graft.functions.VectorExpressions.nearestCentroid(assignVec, kernel))
    // the PQ code quantizes the ASSIGN-space vector (normalized under
    // cosine) — the same vector ADC distances are measured against; in
    // residual mode the code quantizes its offset from the list centroid
    val withCode = pq match {
      case None => withCid
      case Some((cb, residual)) =>
        val pqKernel = new org.apache.spark.sql.graft.PqKernel(
          spark.sparkContext.broadcast(cb),
          if (residual) bcCentroids else null)
        withCid.withColumn("code",
          if (residual)
            graft.functions.VectorExpressions.pqEncodeResidual(
              assignVec, col("cid"), pqKernel)
          else
            graft.functions.VectorExpressions.pqEncode(assignVec, pqKernel))
    }
    // cluster by list before writing: without this every task writes a
    // sliver into every cid directory (tasks × nList small files — slow
    // to commit here, slow to list/read at scale). One shuffle buys one
    // well-sized file per list per write; for petabyte lists, salt the
    // partition key to split a hot list across writers.
    // PLACEMENT: when the list count is at most the shuffle parallelism,
    // a bare repartition(col("cid")) Murmur3-collides list ids — ~1/e of
    // the writer tasks idle while others write two whole lists (the
    // measured HnswIndex build/search failure mode, graft.util
    // .ShardSlots) — so small-nList writes place one list per task via
    // the slot mapping. Past that, nList >> partitions and hash placement
    // is statistically balanced (each task writes ~nList/partitions
    // lists), where a 1:1 slot layout would only shrink parallelism.
    val nList = bcCentroids.value.length
    val shufflePartitions = spark.sessionState.conf.numShufflePartitions
    val placed =
      if (nList <= shufflePartitions)
        withCode
          .withColumn("__slot",
            graft.util.ShardSlots.slotCol(col("cid"), 0 until nList))
          .repartition(nList, col("__slot"))
          .drop("__slot")
      else withCode.repartition(col("cid"))
    placed
      .write.mode(mode)
      .partitionBy("cid")
      .parquet(s"$dir/$table")
  }

  /** Append new vectors into the existing index WITHOUT retraining: each
    * vector is assigned against the persisted centroids (under the
    * persisted metric) and written into its cid partition directory
    * (parquet append adds files, never rewrites lists). This is the 100 TB
    * maintenance story — ingesting a new batch costs one assign pass over
    * the batch, not an index rebuild. The coarse quantizer stays fixed,
    * exactly like FAISS `IndexIVF.add` after training (reference keeps a
    * build-once index the same way, DeepJoin/annIndex.py:42–51). Returns
    * the appended row count.
    *
    * Centroid drift: appended data from a shifted distribution degrades
    * list balance, not correctness (search stays exact within probed
    * lists). [[rebalance]] re-trains the quantizer in place when drift
    * warrants it. Maintenance is single-writer, enforced by
    * [[graft.util.IndexLock]]: append and rebalance take the per-index
    * `_writer.lock` and fail fast on contention.
    *
    * Duplicate ids are rejected by default (`checkPresence`), matching
    * [[HnswIndex.append]] / the other index families: a retried crashed
    * append that re-submits an already-committed batch would otherwise
    * land every id twice in its cid partition, and search would return
    * that neighbor twice within top-k. The check is one column-pruned id
    * scan + join; the streaming ingester skips it because its watermark
    * gate already anti-joins each batch against the committed ids.
    */
  def append(
      spark: SparkSession,
      dir: String,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      checkPresence: Boolean = true): Long =
    graft.util.IndexLock.withLock(spark, dir, "IvfIndex.append") {
      appendImpl(spark, dir, newVectors, idCol, vecCol, checkPresence)
    }

  private def appendImpl(
      spark: SparkSession,
      dir: String,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      checkPresence: Boolean): Long = {
    // a crashed rebalance left either staged debris or a half-committed
    // swap; resolve it BEFORE appending — files landed in a table that a
    // later roll-forward replaces would be lost silently
    recoverSwap(spark, dir)
    // pin the batch before counting: count and write must see the SAME
    // rows (a non-deterministic source re-evaluated per action would
    // otherwise return a count that differs from what landed), and the
    // pin also spares the source a second full scan
    val batch = newVectors
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .localCheckpoint(eager = false)
    val n = batch.count()
    if (checkPresence) {
      require(batch.groupBy("id").count().filter(col("count") > 1).isEmpty,
        "IvfIndex.append: duplicate ids within the appended batch")
      require(readIds(spark, dir).join(batch.select("id"), "id").isEmpty,
        "IvfIndex.append: id already present in the index")
    }
    appendPrepared(spark, dir, batch, "id", "vec",
      loadCentroids(spark, dir), loadMetric(spark, dir), loadPq(spark, dir))
    n
  }

  /** [[append]]'s assign-and-write body against CALLER-loaded metadata —
    * for per-batch callers (the streaming ANN ingester) that load the
    * centroid/metric/PQ tables ONCE and share them between their
    * [[search]] probe (`preMeta`) and their append, instead of paying
    * the three metadata collects twice per micro-batch. The caller must
    * already hold the writer lock and have run [[recoverSwap]] (both are
    * part of the gated-batch critical section).
    */
  private[graft] def appendPrepared(
      spark: SparkSession,
      dir: String,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Float]],
      metric: String,
      pq: Option[(PqCodebooks, Boolean)]): Unit = {
    val bc = spark.sparkContext.broadcast(centroids)
    writeAssignments(newVectors, idCol, vecCol, dir, bc,
      HnswSearch.isCosine(metric), pq, SaveMode.Append,
      new org.apache.spark.sql.graft.CentroidKernel(bc))
  }

  /** (centroids, metric, pq) in one load — see [[appendPrepared]]. */
  private[graft] def loadIndexMeta(spark: SparkSession, dir: String)
      : (Array[Array[Float]], String, Option[(PqCodebooks, Boolean)]) =
    (loadCentroids(spark, dir), loadMetric(spark, dir), loadPq(spark, dir))

  /** Commit-generation fingerprint of the [[loadIndexMeta]] tables — the
    * key an ingest loop's per-loop metadata memo revalidates against
    * each batch ([[graft.streaming.Streams.MetaMemo]]): a [[build]] or
    * [[rebalance]] committing (or being crash-recovered) BETWEEN batches
    * swaps centroids/params/pq, and a memo that kept serving the
    * pre-swap centroids would probe and append against lists whose
    * quantizer was replaced — wrong list membership, silently degraded
    * search. Filesystem metadata only (one listing per table, no Spark
    * jobs), so revalidation costs nothing against the per-batch metadata
    * read the memo deletes. `assignments/` is deliberately NOT part of
    * the key — appends grow it every batch, and the memo'd tables are
    * exactly the ones appends never touch.
    */
  private[graft] def metaGen(spark: SparkSession, dir: String): Long =
    graft.util.StagedTables.metaFingerprint(
      new Path(dir).getFileSystem(spark.sessionState.newHadoopConf()),
      dir, Seq("centroids", "params", "pq"))

  /** The committed id set (one `id` column, column-pruned scan — no
    * vector I/O). Package-private for the streaming ingester's freshness
    * marker join, mirroring [[graft.text.Bm25Index.readDoclens]] /
    * [[graft.dedup.LshDedupIndex.readSignatures]].
    */
  private[graft] def readIds(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/assignments").select(col("id"))

  /** Per-list occupancy of a persisted index: (cid, n_vectors), one row
    * per inverted list. The balance diagnostic that decides rebuild
    * cadence — drifted appends skew lists, and probe latency follows the
    * LARGEST probed list, not the mean. Reads only the partition column
    * (column-pruned scan, no vector I/O).
    */
  def stats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/assignments")
      .groupBy("cid").agg(count(lit(1)).as("n_vectors"))

  /** Rebuild-cadence signal — the operational answer to "when is rebuild
    * due?" that the IVF-PQ drift harness ([[IvfPqDrift]]) measures
    * offline. One row:
    *
    *  - `n_rows` — current corpus size (column-pruned id scan);
    *  - `n_at_train` — corpus size when the quantizer/codebooks last
    *    trained (null for pre-column legacy indexes: unknown, not fresh);
    *  - `frac_appended_since_train` — (n_rows − n_at_train)/n_rows, the
    *    CHEAP proxy: appends are the only way corpus and training drift
    *    apart (builds and vectors-only rebalances reset the anchor;
    *    PQ rebalances preserve it because they keep the codebooks);
    *  - `mean_adc_displacement` — the DIRECT quality signal, PQ indexes
    *    only (null otherwise): over `probeQueries` sampled member
    *    vectors, the mean |ADC rank − exact rank| of the exact top-k
    *    within the k·rerank ADC shortlist, from two probes of the live
    *    index. Fresh codebooks order the shortlist nearly exactly
    *    (displacement ≈ small); drifted appends quantize badly and the
    *    ADC order scrambles — the same mechanism that collapsed recall
    *    in the drift harness (build 0.69 → drifted 0.22 at the 20k
    *    tier), caught here from the index alone, no ground truth or
    *    harness run needed.
    *
    * Operating rule — MEASURED, not a trend-reading exercise
    * (the `ivfpqdrift` probe reads this signal beside every drift
    * stage's harness recall; SCALE_r19_ivfpq_staleness_uniform.json is
    * the current-bracket artifact, measured under the r19 hash-ordered
    * training sample, with SCALE_r18_ivfpq_staleness.json as the prior
    * realization): every PQ [[build]] snapshots the post-build
    * `mean_adc_displacement` into the index (`adc_anchor/`, beside
    * `n_at_train` — its absolute value is corpus-dependent: ~3.9–3.95
    * at the 20k tier vs 8.73 at 2k, where the k·rerank shortlist width
    * saturates it), and this row alarms when the live value reaches
    * [[AdcDisplacementAlarmRatio]]× that anchor:
    *
    *  - `disp_at_train` — the persisted anchor (null: anchor-less
    *    legacy/vectors-only index, or a build that crashed between its
    *    commit and the anchor write);
    *  - `displacement_ratio` — live/anchor, null unless the live probe
    *    ran the same protocol the anchor records (probeQueries, k,
    *    nProbe, rerank, seed all match — a mismatched probe is not the
    *    measured bracket);
    *  - `rebuild_due` — ratio ≥ [[AdcDisplacementAlarmRatio]], the
    *    one-line CODEBOOK-cadence answer, from index state alone (no
    *    operator-kept snapshot; [[rebuildDue]] remains for callers
    *    holding their own anchor).
    *
    * The alarm's semantics are CODEBOOK staleness — see the threshold
    * constant's scaladoc for the two-realization bracket (fresh ≤ 1.20×,
    * codebook-stale ≥ 1.32× including post-rebalance) and for the
    * measured proof that the ratio is NOT monotone with serving recall.
    * [[rebalance]] keeps both the codebooks and the anchor (the stat
    * tracks codebook drift, which rebalance cannot fix — and after one
    * the alarm correctly stays up until a PQ [[build]] retrains). The
    * earlier "frac ≈ 0.25" note was optimistic for adversarial drift:
    * the r18 artifact measured recall halved at frac 0.107 — treat
    * `frac` as the zero-cost trailing indicator (any material value
    * says "go read the displacement") and the displacement ratio as
    * the codebook alarm. Caveat at SPEC-scale corpora (≲ a few k
    * rows): the displacement floor saturates (2k tier: 8.73 build,
    * only ≤ 1.20× when drifted — all three realizations agree) —
    * there, frac is the better signal and `rebuild_due` stays quiet
    * even when drifted; the operational tiers this signal exists for
    * sit on the clean side. A fired alarm means the codes are no
    * longer ordering the shortlist the way exact distance would, and
    * [[rebalance]] will NOT recover THEM (it keeps the codebooks);
    * schedule a [[build]] — noting (measured, r19) that when serving
    * runs the rerank path, a rebalance alone can restore recall while
    * the alarm stays up.
    *
    * Cost: one id-count + (PQ only) ONE `probeQueries`-sized probe at
    * `nProbe` (the rerank search carries both the ADC and the exact
    * ordering) — index-size-independent beyond the probed lists' scan.
    */
  def staleness(
      spark: SparkSession,
      dir: String,
      probeQueries: Int = 64,
      k: Int = 10,
      nProbe: Int = 8,
      rerank: Int = 4,
      seed: Int = 42): DataFrame = {
    import spark.implicits._
    val nRows = readIds(spark, dir).count()
    val nAtTrain = loadNAtTrain(spark, dir)
    val frac = nAtTrain.map(t =>
      if (nRows == 0) 0.0 else math.max(0.0, (nRows - t).toDouble / nRows))
    val hasPq = {
      val p = new Path(s"$dir/pq")
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    val disp: Option[Double] =
      if (!hasPq || nRows == 0) None
      else {
        // ONE metadata load shared by both probe searches (3 driver
        // collects instead of 6 — the probe is fixed-cost-dominated at
        // spec scale)
        val (c, m, pqMeta) = loadIndexMeta(spark, dir)
        measureAdcDisplacement(spark, dir, nRows, probeQueries, k,
          nProbe, rerank, seed, Some((c, m, pqMeta)))
      }
    // the persisted post-build anchor ([[buildLocked]]'s final step):
    // ratio/alarm only when the live probe ran the SAME protocol the
    // anchor was measured under — a 128-query nProbe-16 displacement
    // against a 64-query nProbe-8 anchor is not the measured bracket
    val anchor = loadAnchor(spark, dir)
    val anchorMatches = anchor.exists(a =>
      a.probeQueries == probeQueries && a.k == k && a.nProbe == nProbe &&
        a.rerank == rerank && a.seed == seed)
    val dispAtTrain: Option[Double] = anchor.map(_.disp)
    val ratio: Option[Double] = for {
      d <- disp
      a <- anchor if anchorMatches && a.disp > 0.0
    } yield d / a.disp
    val due: Option[Boolean] = ratio.map(_ >= AdcDisplacementAlarmRatio)
    Seq((nRows, nAtTrain, frac, disp, dispAtTrain, ratio, due))
      .toDF("n_rows", "n_at_train", "frac_appended_since_train",
        "mean_adc_displacement", "disp_at_train", "displacement_ratio",
        "rebuild_due")
  }

  /** Mean |ADC rank − exact rank| of the exact top-k within the
    * k·rerank ADC shortlist, over a seeded member sample — the direct
    * codebook-quality probe [[staleness]] reports and [[buildLocked]]
    * anchors. ONE probe of the live index (the rerank search carries
    * the shortlist's ADC rank alongside the exact rank — `keepAdcRank`);
    * None on an empty result (a degenerate corpus).
    */
  private def measureAdcDisplacement(
      spark: SparkSession,
      dir: String,
      nRows: Long,
      probeQueries: Int,
      k: Int,
      nProbe: Int,
      rerank: Int,
      seed: Int,
      pre: Option[(Array[Array[Float]], String,
        Option[(PqCodebooks, Boolean)])] = None): Option[Double] = {
    // caller-loaded metadata (staleness / the post-build anchor, which
    // holds everything in hand) shared by BOTH searches
    val preMeta = pre.map { case (c, m, _) => (c, m) }
    val prePq = pre.flatMap(_._3)
    // deterministic member sample as the probe query set: the
    // seeded id-hash draws uniformly across list directories (a
    // bare limit() would sample whichever lists list first)
    val sample = spark.read.parquet(s"$dir/assignments")
      .select(col("id"), col("vec"))
      .filter(pmod(xxhash64(col("id"), lit(seed)), lit(math.max(1L, nRows)))
        < lit(math.min(nRows, probeQueries * 2L)))
      .limit(probeQueries)
      .localCheckpoint(eager = false)
    // ONE search carries both orderings (keepAdcRank): the rerank path
    // already ranks the k·rerank ADC shortlist before the exact rerank,
    // so the exact top-k rows come back WITH their shortlist ADC rank —
    // equal row-for-row to the former two-search join (same queries,
    // same nProbe → identical shortlist and windows), at half the
    // probe/scan/ADC compute and one fewer probed-cid collect
    val both = search(spark, dir, sample, "id", "vec",
      k = k, nProbe = nProbe, usePq = true, rerank = math.max(1, rerank),
      preMeta = preMeta, prePq = prePq, keepAdcRank = true)
    val joined = both
      .agg(avg(abs(col("__adc_rank") - col("rank"))).as("d"))
      .collect()(0)
    if (joined.isNullAt(0)) None else Some(joined.getDouble(0))
  }

  /** The displacement anchor's measurement protocol — [[staleness]]'s
    * defaults, pinned as named constants so the anchor row records the
    * protocol it was measured under and the ratio only fires against a
    * matching live probe.
    */
  private[knn] val AnchorProbeQueries = 64
  private[knn] val AnchorK = 10
  private[knn] val AnchorNProbe = 8
  private[knn] val AnchorRerank = 4
  private[knn] val AnchorSeed = 42

  private val AnchorTable = "adc_anchor"

  private[knn] final case class AdcAnchor(disp: Double, probeQueries: Int,
      k: Int, nProbe: Int, rerank: Int, seed: Int)

  /** Persist the post-build displacement anchor (tmp + atomic rename —
    * the live table is never torn; a crash between delete and rename
    * leaves an anchor-less index, the honest legacy state).
    */
  private def writeAnchor(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      disp: Double): Unit = {
    import spark.implicits._
    Seq((disp, AnchorProbeQueries, AnchorK, AnchorNProbe, AnchorRerank,
        AnchorSeed))
      .toDF("disp_at_train", "probe_queries", "k", "n_probe", "rerank",
        "seed")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$AnchorTable.tmp")
    fs.delete(new Path(s"$dir/$AnchorTable"), true)
    require(fs.rename(new Path(s"$dir/$AnchorTable.tmp"),
        new Path(s"$dir/$AnchorTable")),
      s"IvfIndex: could not publish $AnchorTable under $dir")
  }

  private def deleteAnchor(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit = {
    fs.delete(new Path(s"$dir/$AnchorTable.tmp"), true)
    fs.delete(new Path(s"$dir/$AnchorTable"), true)
  }

  private def loadAnchor(spark: SparkSession,
      dir: String): Option[AdcAnchor] = {
    val p = new Path(s"$dir/$AnchorTable")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val r = spark.read.parquet(s"$dir/$AnchorTable")
        .select("disp_at_train", "probe_queries", "k", "n_probe", "rerank",
          "seed").collect()
      require(r.length == 1, s"IvfIndex: malformed $AnchorTable under $dir")
      Some(AdcAnchor(r.head.getDouble(0), r.head.getInt(1), r.head.getInt(2),
        r.head.getInt(3), r.head.getInt(4), r.head.getInt(5)))
    }
  }

  /** The measured CODEBOOK-staleness alarm threshold on [[staleness]]'s
    * `mean_adc_displacement`, relative to its post-build anchor.
    *
    * What the signal tracks — and what it does NOT: displacement
    * measures how badly the PQ codes order the shortlist against exact
    * distances, i.e. CODEBOOK drift. It separates codebook-fresh from
    * codebook-stale states in BOTH committed 20k-tier realizations of
    * the drift harness (the r19 uniform-sampling fix re-rolled the
    * quantizer init and moved the band, which is why the threshold
    * sits between the two realizations' extremes): fresh states —
    * post-build/post-rebuild 1.0, spec-tier probe noise ≤ 1.20 —
    * against codebook-stale states — drifted appends 1.32–2.19 across
    * both realizations AND post-rebalance 1.39/1.94. A rebalance
    * retrains the coarse quantizer but NEVER the codebooks, so the
    * alarm correctly stays up after one until a PQ [[build]] clears it
    * (SCALE_r18_ivfpq_staleness.json;
    * SCALE_r19_ivfpq_staleness_uniform.json supersedes the r19
    * prefix-sample artifact and its 1.5 threshold, which the re-rolled
    * init broke on both sides: a collapsed stage at 1.32 slipped under
    * it while the recovered rebalance at 1.94 fired over it).
    *
    * The ratio is therefore NOT monotone with SERVING recall: the
    * committed pair measures a recall-collapsed stage at 1.32×
    * (p32 0.236) and a recall-RECOVERED post-rebalance state at 1.94×
    * (p32 0.728 — above its own build's 0.607). `rebuild_due` answers
    * "are the codebooks due a retrain?"; the serving-quality question
    * under drift belongs to the rerank path and the [[IvfPqDrift]]
    * harness.
    */
  val AdcDisplacementAlarmRatio: Double = 1.25

  /** The one-line cadence decision: is a [[build]] due, given a
    * displacement snapshot and the live value? (Ratio rule — absolute
    * displacement is corpus-dependent.) Since the anchor is persisted
    * at build time, [[staleness]] emits `rebuild_due` directly; this
    * form remains for callers tracking their own anchor (e.g. one
    * snapshotted under a non-default probe protocol).
    */
  def rebuildDue(buildDisplacement: Double,
      currentDisplacement: Double): Boolean =
    currentDisplacement >= AdcDisplacementAlarmRatio * buildDisplacement

  /** The persisted training-time corpus size, if this index (or its last
    * vectors-only rebalance) recorded one — None for legacy layouts.
    */
  private def loadNAtTrain(spark: SparkSession, dir: String): Option[Long] = {
    val p = new Path(s"$dir/params")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val df = spark.read.parquet(s"$dir/params")
      if (!df.columns.contains("n_at_train")) None
      else {
        val r = df.select("n_at_train").collect()
        if (r.length != 1 || r.head.isNullAt(0)) None
        else Some(r.head.getLong(0))
      }
    }
  }

  /** Re-train the coarse quantizer IN PLACE on the current corpus and
    * re-file every vector — the answer to append drift that [[stats]]
    * diagnoses. [[append]] keeps the quantizer fixed (FAISS `IndexIVF.add`
    * semantics), so a long append tail from a shifted distribution piles
    * into a few hot lists and probe latency follows the largest probed
    * list; a full [[build]] fixes that but needs the original source
    * frame. Rebalance needs only the index directory: the persisted lists
    * ARE the corpus.
    *
    * What it does: (1) trains fresh centroids on a bounded sample of the
    * persisted vectors — same trainer as build, including the
    * `distributedTrain` path for 10⁴⁺-list indexes; (2) re-assigns all
    * rows and rewrites one well-sized file per list (so rebalance is also
    * the IVF COMPACTION story — append's accumulated small files collapse
    * here, the role vacuum plays for the other index families);
    * (3) re-encodes PQ codes against the new centroids when the index
    * carries residual codebooks (the codebooks themselves are kept — they
    * quantize residual clouds, which move far less than assignments; a
    * drift large enough to invalidate them warrants [[build]]).
    *
    * Commit protocol: all three tables (`centroids`, `params`,
    * `assignments`) are written beside the live ones as `<table>.tmp`,
    * then an intent marker (`_rebalance_commit`) is created and the
    * swaps run marker-protected: recovery on entry rolls FORWARD (marker
    * present — finish each table's swap from whatever rename it crashed
    * at) or BACK (no marker — delete staged debris, live tables were
    * never touched). Sequential renames mean a crash can leave a
    * NEW-quantizer / OLD-lists mix until the next maintenance op runs
    * recovery; a full probe (`nProbe = nList`) stays exact even then,
    * and the single-writer lock plus metadata-only rename window make
    * the exposure milliseconds.
    *
    * Search results at `nProbe = nList` are invariant under rebalance
    * (every list is scanned either way); pruned probes change exactly as
    * a rebuild would change them. Returns the new list count.
    *
    * `nList = 0` keeps the persisted list count; pass a larger value to
    * grow capacity (e.g. after the corpus 10×-ed past the build-time
    * sizing); `nList < 0` re-sizes automatically as max(16, ⌈√N⌉) over
    * the CURRENT index row count ([[ApproxKnn.autoNList]]) — the knob a
    * periodic maintenance job wants, since it tracks the corpus as it
    * grows with no caller-side bookkeeping. The count rides the row
    * scan rebalance already does.
    */
  def rebalance(
      spark: SparkSession,
      dir: String,
      nList: Int = 0,
      kmeansIters: Int = 5,
      sampleCap: Int = 20000,
      seed: Int = 42,
      distributedTrain: Boolean = false): Int =
    graft.util.IndexLock.withLock(spark, dir, "IvfIndex.rebalance") {
      rebalanceImpl(spark, dir, nList, kmeansIters, sampleCap, seed,
        distributedTrain)
    }

  private val SwappedTables = Seq("centroids", "params", "pq", "assignments")
  private val CommitMarker = "_rebalance_commit"
  // marker CONTENT distinguishes the committing op: rebalance leaves the
  // marker empty (historic format — old crash debris recovers as
  // rebalance); build writes one of these so roll-forward recovery also
  // clears ingest state (and the stale pq table for a PQ-less rebuild),
  // neither of which a rebalance recovery may touch
  private val MarkerBuild = "build"
  private val MarkerBuildClearPq = "build_clear_pq"

  /** Commit every staged `<table>.tmp` over its live table — rebalance
    * never stages `pq`, a PQ-less build stages it neither; the skip and
    * first-build cases are [[graft.util.StagedTables.swapStaged]]'s
    * contract.
    */
  private def swapStaged(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit =
    graft.util.StagedTables.swapStaged(fs, dir, SwappedTables, "IvfIndex")

  private def rebalanceImpl(
      spark: SparkSession,
      dir: String,
      nList: Int,
      kmeansIters: Int,
      sampleCap: Int,
      seed: Int,
      distributedTrain: Boolean): Int = {
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    recoverSwap(spark, dir)

    val metric = loadMetric(spark, dir)
    val cosine = HnswSearch.isCosine(metric)
    val pq = loadPq(spark, dir)
    val k0 = loadCentroids(spark, dir).length

    // the persisted lists are the corpus; cid is dropped — it is the old
    // quantizer's opinion, about to be re-derived
    val corpus = spark.read.parquet(s"$dir/assignments")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    // the corpus arrives ORDERED BY OLD LIST (partition directories) — a
    // bare limit() would sample whichever lists happen to list first and
    // train the new quantizer on a few old lists' neighborhoods. A seeded
    // row-hash filter draws uniformly across lists for ~cap rows, without
    // a global sort; the cap itself still bounds the driver
    val nRows = spark.read.parquet(s"$dir/assignments").count()
    val k =
      if (nList > 0) nList
      else if (nList < 0) ApproxKnn.autoNList(nRows)
      else k0
    // the hash sample bounds only the DRIVER-collect trainer; the
    // distributed trainer runs on the full persisted corpus — same
    // contract as build, where nList beyond the sample cap is exactly
    // why distributedTrain exists (a 10⁵-list rebalance trained on a
    // 2×sampleCap sample would silently clamp k to the sample size)
    val trainRows =
      if (distributedTrain || nRows <= sampleCap) corpus
      else corpus.filter(
        pmod(xxhash64(col("id"), lit(seed)), lit(nRows)) < lit(sampleCap * 2L))

    // train exactly like build: spherical (unit-normalized, zero-free)
    // vectors under cosine, raw vectors under L2
    val sampleSrc =
      if (cosine) ApproxKnn.unitNormalized(trainRows, "id", "vec",
        "__id", "__vec", "__zero").filter(!col("__zero"))
        .select(col("__id"), col("__vec"))
      else trainRows.select(col("id").as("__id"), col("vec").as("__vec"))
    val centroids =
      if (distributedTrain)
        KMeans.train(
          if (cosine && sampleSrc.isEmpty) trainRows.select(col("vec").as("__vec"))
          else sampleSrc,
          "__vec", k, kmeansIters, seed, "IvfIndex.rebalance")
      else {
        // hash-ordered draw from the (already hash-uniform) 2×cap
        // superset: the former bare limit() took whichever of those
        // rows answered first — deterministic across layouts now, same
        // rule as build's collectSample
        def draw(df: DataFrame): Array[Array[Float]] = df
          .orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
          .limit(sampleCap)
          .select(col("__vec")).as[Array[Float]].collect()
        val sample0 = draw(sampleSrc)
        val sample = if (sample0.nonEmpty) sample0
          else draw(trainRows.select(col("id").as("__id"),
            col("vec").as("__vec")))
        require(sample.nonEmpty, s"IvfIndex.rebalance: empty index under $dir")
        val trained = ApproxKnn.kmeans(sample, math.min(k, sample.length),
          kmeansIters, seed)
        splitHotLists(sample, trained, kmeansIters, seed)
      }
    val bcCentroids = spark.sparkContext.broadcast(centroids)

    // stage all three tables beside the live ones
    centroids.zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq.toDF("cid", "vec")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids.tmp")
    // n_at_train across rebalance: a PQ index KEEPS its codebooks (the
    // stat tracks exactly the drift rebalance cannot fix — see the
    // IvfPqDrift two-regime result), so the training anchor is preserved
    // (legacy indexes without the column stay unknown rather than
    // claiming false freshness); a vectors-only index has its whole
    // quantizer retrained here, so the anchor resets to the current
    // corpus
    val nAtTrain: Option[Long] =
      if (pq.isDefined) loadNAtTrain(spark, dir) else Some(nRows)
    Seq((centroids.length, metric, seed, nAtTrain))
      .toDF("n_list", "metric", "seed", "n_at_train")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/params.tmp")
    writeAssignments(corpus, "id", "vec", dir, bcCentroids, cosine, pq,
      SaveMode.Overwrite,
      new org.apache.spark.sql.graft.CentroidKernel(bcCentroids),
      table = "assignments.tmp")

    // intent marker (empty = rebalance), then the swaps it protects
    fs.create(new Path(s"$dir/$CommitMarker"), false).close()
    swapStaged(fs, dir)
    fs.delete(new Path(s"$dir/$CommitMarker"), false)
    centroids.length
  }

  /** Balance refinement after Lloyd (the rebalance trainer's whole point
    * is leveling): plain Lloyd is a local-optimum method — when the init
    * draw misses a dense far mode entirely, ONE centroid migrates to it
    * and owns the whole mode, and more iterations never split it (every
    * in-mode point is already nearest that centroid). The classic remedy
    * (FAISS Clustering's split_clusters): replace the coldest centroid
    * with an epsilon-perturbed COPY of the hottest one, so the pair sits
    * at the cluster's center separated by a tiny vector and the
    * perturbation hyperplane halves the members; two Lloyd steps then
    * settle the halves. Reseeding ON a member instead would fail in high
    * dimension: for an isotropic cluster every member is nearly
    * equidistant from every other (concentration of measure), so a
    * member-centroid only captures a vanishing spherical cap while the
    * mean-centroid keeps everything else. The perturbation direction is
    * center → farthest member — radial for isotropic clusters, toward
    * the dominant sub-mode for bimodal ones. Repeats while the hottest
    * list holds > `splitFactor`× the mean; a handful of rounds on the
    * driver-side sample, never data-sized work.
    */
  private[knn] def splitHotLists(
      sample: Array[Array[Float]],
      trained: Array[Array[Float]],
      iters: Int,
      seed: Int,
      splitFactor: Double = 2.0,
      maxRounds: Int = 8): Array[Array[Float]] = {
    var centroids = trained
    val k = centroids.length
    if (k < 2) return centroids
    val mean = sample.length.toDouble / k
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      // assign the sample, count occupancy per centroid
      val counts = new Array[Int](k)
      val members = Array.fill(k)(List.empty[Array[Float]])
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < v.length) {
            val x = v(i) - (if (i < centroids(c).length) centroids(c)(i) else 0f)
            d += x * x; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        members(best) ::= v
      }
      val hot = counts.indices.maxBy(counts)
      if (counts(hot) <= splitFactor * mean) done = true
      else {
        val cold = counts.indices.minBy(counts)
        val c = centroids(hot)
        val far = members(hot).maxBy { v =>
          var d = 0.0; var i = 0
          while (i < v.length) {
            val x = v(i) - (if (i < c.length) c(i) else 0f); d += x * x; i += 1
          }
          d
        }
        val dim = c.length
        var dNorm2 = 0.0
        val dirV = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          dirV(i) = (if (i < far.length) far(i) else 0f) - c(i)
          dNorm2 += dirV(i) * dirV(i); i += 1
        }
        if (dNorm2 == 0.0) done = true // all members identical: unsplittable
        else {
          val eps = 0.05f
          val plus = new Array[Float](dim)
          val minus = new Array[Float](dim)
          i = 0
          while (i < dim) {
            plus(i) = c(i) + eps * dirV(i)
            minus(i) = c(i) - eps * dirV(i); i += 1
          }
          centroids = centroids.clone()
          centroids(cold) = plus
          centroids(hot) = minus
          centroids = ApproxKnn.lloydDriver(sample, centroids,
            math.max(2, iters / 2))
          round += 1
        }
      }
    }
    centroids
  }

  /** Crash recovery for the marker-protected swap shared by [[build]]
    * and [[rebalance]] — run on entry by every writer. Marker present =
    * the swaps were in flight: roll each table FORWARD from whichever
    * rename the crash interrupted ([[swapStaged]] is resume-safe), then
    * replay the marker op's post-swap steps — a BUILD marker also clears
    * ingest state (and, for a PQ-less rebuild, the stale pq table),
    * which a rebalance recovery must never touch (same corpus, same
    * watermark). No marker = staging never committed: roll BACK by
    * deleting staged/old debris (live tables were never renamed before
    * the marker existed).
    */
  private[graft] def recoverSwap(spark: SparkSession, dir: String): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) return
    val marker = new Path(s"$dir/$CommitMarker")
    graft.util.StagedTables.sweepMarkerTmp(fs, dir, CommitMarker)
    if (fs.exists(marker)) {
      // markers publish atomically (writeMarker), so empty = a genuine
      // rebalance (its historic contentless format) and a read FAILURE
      // propagates — defaulting it would roll a build forward as a
      // rebalance, silently skipping the ingest clear / pq delete
      val markerOp = graft.util.StagedTables.readMarker(fs, marker)
      swapStaged(fs, dir)
      if (markerOp.startsWith(MarkerBuild)) {
        if (markerOp == MarkerBuildClearPq)
          fs.delete(new Path(s"$dir/pq"), true)
        // replay the build's in-window anchor delete: the crashed build
        // never measured its fresh anchor, and the old one describes
        // codebooks the swap just replaced
        deleteAnchor(fs, dir)
        graft.util.IngestState.clear(spark, dir)
      }
      fs.delete(marker, false)
    } else
      graft.util.StagedTables.rollBack(fs, dir, SwappedTables,
        "IvfIndex.recover")
  }

  /** The persisted PQ codebooks (and their residual flag), if this index
    * was built with `pqM > 0`. Presence of `pq/` IS the marker —
    * m/ksub/dsub reconstruct from the (s, c, vec) rows, no params
    * round-trip to drift against; a pre-residual layout without the flag
    * column reads as raw (absolute-position) codes.
    */
  private def loadPq(spark: SparkSession, dir: String): Option[(PqCodebooks, Boolean)] = {
    import spark.implicits._
    val p = new Path(s"$dir/pq")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val raw = spark.read.parquet(s"$dir/pq")
      val withFlag =
        if (raw.columns.contains("residual")) raw
        else raw.withColumn("residual", lit(false))
      val rows = withFlag
        .select(col("s"), col("c"), col("vec").cast("array<float>"),
          col("residual"))
        .as[(Int, Int, Array[Float], Boolean)].collect()
      require(rows.nonEmpty, s"IvfIndex: empty pq codebooks under $dir")
      val m = rows.map(_._1).max + 1
      val ksub = rows.map(_._2).max + 1
      require(rows.length == m * ksub, s"IvfIndex: ragged pq codebooks under $dir")
      require(rows.map(_._4).distinct.length == 1,
        s"IvfIndex: inconsistent residual flags under $dir")
      val books = Array.ofDim[Array[Float]](m, ksub)
      rows.foreach { case (s, c, v, _) => books(s)(c) = v }
      Some((new PqCodebooks(books), rows.head._4))
    }
  }

  private def loadCentroids(spark: SparkSession, dir: String): Array[Array[Float]] = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$dir/centroids")
      .select(col("cid"), col("vec").cast("array<float>"))
      .as[(Int, Array[Float])].collect().sortBy(_._1).map(_._2)
    require(centroids.nonEmpty, s"IvfIndex: no centroids under $dir")
    centroids
  }

  /** The persisted metric; indexes written before `params/` existed are
    * squared-L2 by construction — read them as such instead of failing.
    */
  private def loadMetric(spark: SparkSession, dir: String): String = {
    val p = new Path(s"$dir/params")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) KnnJoin.MetricL2Sq // legacy pre-params layout
    else {
      val rows = spark.read.parquet(s"$dir/params").select("metric").collect()
      require(rows.length == 1, s"IvfIndex: malformed params under $dir")
      rows.head.getString(0)
    }
  }

  /** Probe the persisted index: for each query, the `nProbe` nearest
    * centroids are computed against the (tiny, collected) centroid table,
    * and the scan of `assignments/` carries a `cid IN (...)` partition
    * filter — only the probed lists' files are read. The metric comes
    * from the persisted `params/`, never from the caller. Output contract
    * matches [[KnnJoin]]: (query_id, neighbor_id, dist, rank).
    */
  def search(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4,
      excludeSelf: Boolean = true,
      usePq: Boolean = false,
      rerank: Int = 4,
      preMeta: Option[(Array[Array[Float]], String)] = None,
      prePq: Option[(PqCodebooks, Boolean)] = None,
      keepAdcRank: Boolean = false): DataFrame = {
    import spark.implicits._
    require(nProbe > 0, s"IvfIndex.search: nProbe must be positive, got $nProbe")
    require(!keepAdcRank || rerank > 0,
      "IvfIndex.search: keepAdcRank needs the PQ rerank path (rerank > 0)")
    // preMeta: caller-loaded (centroids, metric) — a per-batch caller
    // (the streaming ANN ingester) loads the metadata ONCE via
    // [[loadIndexMeta]] and shares it between probe and append
    val (centroids, metric) = preMeta.getOrElse(
      (loadCentroids(spark, dir), loadMetric(spark, dir)))
    val cosine = HnswSearch.isCosine(metric)
    // probe-cid selection via the native codegen expression (broadcast
    // codebook, no boxed Seq[Float] per query row)
    val bcCentroids = spark.sparkContext.broadcast(centroids)
    val kernel = new org.apache.spark.sql.graft.CentroidKernel(bcCentroids)

    val qBase = graft.util.Par.balance(
      queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<float>").as("__query_vec")))
    val probeVec =
      if (!cosine) col("__query_vec")
      else {
        val norm = sqrt(graft.functions.VectorExpressions
          .dotProduct(col("__query_vec"), col("__query_vec")))
        when(norm > 0,
          transform(col("__query_vec"), x => (x / norm).cast("float")))
          .otherwise(col("__query_vec"))
      }
    val probed = qBase
      .withColumn("cid", explode(graft.functions.VectorExpressions
        .nearestCentroids(probeVec, kernel, nProbe)))

    // static IN-filter on the partition column: the probed cid UNION is at
    // most nList values (collect is bounded by the centroid count, never
    // the data), and the filter prunes unprobed list directories at the
    // file-listing level — guaranteed, not dependent on dynamic pruning.
    // At FULL probe (nProbe >= nList) every query probes every list, so
    // the filter is a tautology — skip its collect (one scheduler
    // round-trip per search; exhaustive probes are the exact-equivalence
    // oracle form AND the streaming serving default at small nList)
    val listFilter =
      if (nProbe >= centroids.length) lit(true)
      else {
        val probedCids = probed.select("cid").distinct().as[Int].collect()
        col("cid").isin(probedCids.map(Integer.valueOf).toSeq: _*)
      }
    val w = Window.partitionBy("query_id").orderBy(asc("dist"), asc("neighbor_id"))

    if (!usePq) {
      val lists = spark.read.parquet(s"$dir/assignments")
        .filter(listFilter)
        .select(col("cid"), col("id").as("neighbor_id"),
          col("vec").as("__neighbor_vec"))

      val joined = probed.join(lists, Seq("cid"))
      val pairs =
        if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id"))
        else joined
      val dist =
        if (cosine) graft.functions.VectorExpressions.cosineDistance(
          col("__query_vec"), col("__neighbor_vec"))
        else graft.functions.VectorExpressions.squaredL2(
          col("__query_vec"), col("__neighbor_vec"))
      pairs
        .withColumn("dist", dist)
        .select("query_id", "neighbor_id", "dist")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    } else {
      // PQ path: the probed-list scan reads (cid, id, m-byte code) —
      // parquet column pruning keeps the vector column's pages on disk,
      // so probe I/O shrinks ~dim·4/m× (32× at 64-d, m=8). ADC scores the
      // codes row-wise; `rerank > 0` re-reads ONLY the short-listed
      // neighbors' vectors for exact distances (narrow id join against
      // the probed lists), which also restores the zero-vector-queries-
      // score-1.0 cosine convention that raw ADC cannot express.
      // prePq: caller-loaded codebooks (the staleness probe's two
      // searches and the post-build anchor measurement share ONE load)
      val (pq, residual) = prePq.orElse(loadPq(spark, dir)).getOrElse(
        throw new IllegalArgumentException(
          s"IvfIndex.search(usePq = true): no pq/ codebooks under $dir — " +
            "build the index with pqM > 0"))
      val pqKernel = new org.apache.spark.sql.graft.PqKernel(
        spark.sparkContext.broadcast(pq),
        if (residual) bcCentroids else null)
      // ADC queries must live in the space the codes quantize: unit-
      // normalized under cosine, raw under L2
      val adcProbed = probed.withColumn("__adc_vec",
        if (!cosine) col("__query_vec")
        else {
          val norm = sqrt(graft.functions.VectorExpressions
            .dotProduct(col("__query_vec"), col("__query_vec")))
          when(norm > 0,
            transform(col("__query_vec"), x => (x / norm).cast("float")))
            .otherwise(col("__query_vec"))
        })
      val codeLists = spark.read.parquet(s"$dir/assignments")
        .filter(listFilter)
        .select(col("cid"), col("id").as("neighbor_id"), col("code"))
      val joined = adcProbed.join(codeLists, Seq("cid"))
      val pairs =
        if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id"))
        else joined
      val adc =
        if (residual) graft.functions.VectorExpressions.pqAdcResidual(
          col("__adc_vec"), col("cid"), col("code"), pqKernel)
        else graft.functions.VectorExpressions.pqAdc(
          col("__adc_vec"), col("code"), pqKernel)
      val keep = if (rerank > 0) k * rerank else k
      val shortList = pairs
        .withColumn("dist", if (cosine) adc / 2.0 else adc)
        .select("query_id", "neighbor_id", "dist", "__query_vec")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= keep)
      if (rerank <= 0) shortList.select("query_id", "neighbor_id", "dist", "rank")
      else {
        val vecs = spark.read.parquet(s"$dir/assignments")
          .filter(listFilter)
          .select(col("id").as("neighbor_id"), col("vec").as("__neighbor_vec"))
        val exact =
          if (cosine) graft.functions.VectorExpressions.cosineDistance(
            col("__query_vec"), col("__neighbor_vec"))
          else graft.functions.VectorExpressions.squaredL2(
            col("__query_vec"), col("__neighbor_vec"))
        // keepAdcRank: carry the shortlist's ADC rank through the rerank
        // join as `__adc_rank` — the staleness/anchor probe
        // ([[measureAdcDisplacement]]) reads both orderings from ONE
        // search instead of paying the probe+scan+ADC+window subtree
        // twice (the r19 q58 regression: two searches per anchor)
        val reranked = shortList
          .select(Seq(col("query_id"), col("neighbor_id"),
            col("__query_vec")) ++
            (if (keepAdcRank) Seq(col("rank").as("__adc_rank")) else Nil): _*)
          .join(vecs, "neighbor_id")
          .withColumn("dist", exact)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
        if (keepAdcRank)
          reranked.select("query_id", "neighbor_id", "dist", "rank",
            "__adc_rank")
        else reranked.select("query_id", "neighbor_id", "dist", "rank")
      }
    }
  }
}
