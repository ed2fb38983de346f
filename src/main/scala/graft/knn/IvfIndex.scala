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
  *  - `params/` — one row (n_list, metric, seed): like [[HnswIndex]]'s
  *    `params/`, the metric rides IN the index — search and append read
  *    it from disk, so a caller cannot probe a cosine-built index with L2.
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
      twoLevelProbes: Int = 4): Int = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cosine = HnswSearch.isCosine(metric)
    // spherical kmeans trains on unit vectors, excluding raw zeros (a raw
    // zero would pull a centroid off the sphere; the distance-1.0
    // convention makes zero vectors list-agnostic anyway)
    val sampleSrc =
      if (cosine) ApproxKnn.unitNormalized(candidates, idCol, vecCol,
        "__id", "__vec", "__zero").filter(!col("__zero")).select(col("__vec"))
      else candidates.select(col(vecCol).cast("array<float>").as("__vec"))
    def collectSample(): Array[Array[Float]] = {
      val sample0 = sampleSrc.select(col("__vec")).limit(sampleCap)
        .as[Array[Float]].collect()
      // all-zero candidate side under cosine: every distance is 1.0 anyway —
      // train on the zeros rather than fail
      val sample = if (sample0.nonEmpty) sample0
        else candidates.select(col(vecCol).cast("array<float>"))
          .limit(sampleCap).as[Array[Float]].collect()
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
    centroids.zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq.toDF("cid", "vec")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    Seq((centroids.length, metric, seed))
      .toDF("n_list", "metric", "seed")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/params")

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
    pq match {
      case Some((cb, residual)) =>
        (for { s <- 0 until cb.m; c <- 0 until cb.ksub }
          yield (s, c, cb.centroids(s)(c), residual))
          .toDF("s", "c", "vec", "residual")
          .repartition(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/pq")
      case None =>
        // rebuilding WITHOUT PQ over a dir previously built WITH it must
        // clear the stale codebooks — pq/'s presence is the marker, and a
        // survivor would make append() re-add codes with books trained on
        // data the Overwrite below just deleted (same staleness class as
        // HnswIndex's pre-clear of manifest/ on rebuild)
        val p = new Path(s"$dir/pq")
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(p)) fs.delete(p, true)
    }

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
      SaveMode.Overwrite, assignKernel)
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
      kernel: org.apache.spark.sql.graft.CentroidIndex): Unit = {
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
    withCode
      // cluster by list before writing: without this every task writes a
      // sliver into every cid directory (tasks × nList small files — slow
      // to commit here, slow to list/read at scale). One shuffle buys one
      // well-sized file per list per write; for petabyte lists, salt the
      // partition key to split a hot list across writers
      .repartition(col("cid"))
      .write.mode(mode)
      .partitionBy("cid")
      .parquet(s"$dir/assignments")
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
    * lists). Rebuild via [[build]] when drift warrants it.
    */
  def append(
      spark: SparkSession,
      dir: String,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String): Long = {
    val centroids = loadCentroids(spark, dir)
    val cosine = HnswSearch.isCosine(loadMetric(spark, dir))
    val n = newVectors.count()
    val bc = spark.sparkContext.broadcast(centroids)
    writeAssignments(newVectors, idCol, vecCol, dir, bc, cosine,
      loadPq(spark, dir), SaveMode.Append,
      new org.apache.spark.sql.graft.CentroidKernel(bc))
    n
  }

  /** Per-list occupancy of a persisted index: (cid, n_vectors), one row
    * per inverted list. The balance diagnostic that decides rebuild
    * cadence — drifted appends skew lists, and probe latency follows the
    * LARGEST probed list, not the mean. Reads only the partition column
    * (column-pruned scan, no vector I/O).
    */
  def stats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/assignments")
      .groupBy("cid").agg(count(lit(1)).as("n_vectors"))

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
      rerank: Int = 4): DataFrame = {
    import spark.implicits._
    val centroids = loadCentroids(spark, dir)
    val cosine = HnswSearch.isCosine(loadMetric(spark, dir))
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
    // file-listing level — guaranteed, not dependent on dynamic pruning
    val probedCids = probed.select("cid").distinct().as[Int].collect()
    val listFilter = col("cid").isin(probedCids.map(Integer.valueOf).toSeq: _*)
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
      val (pq, residual) = loadPq(spark, dir).getOrElse(
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
        shortList.select("query_id", "neighbor_id", "__query_vec")
          .join(vecs, "neighbor_id")
          .withColumn("dist", exact)
          .select("query_id", "neighbor_id", "dist")
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
      }
    }
  }
}
