package graft.knn

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed k-means — the trainer that removes the driver-Lloyd scale
  * ceiling. [[ApproxKnn.kmeans]] trains on a `sampleCap`-bounded collected
  * sample, which caps the cluster count at the sample size; the 100 TB
  * IVF / SemDeDup operating point wants 10⁴–10⁵ centroids trained on
  * 10⁶–10⁷ vectors, which must never land on the driver. (The reference's
  * FAISS analogue trains IVF lists natively in-process,
  * SemLink/join_discoverer.py:277–280 — single-machine training has no
  * 100 TB story at all.)
  *
  * Each Lloyd iteration is ONE DataFrame aggregation over the training
  * frame: the assign runs the codegen [[org.apache.spark.sql.graft
  * .CentroidKernel]] nearest-centroid expression against the broadcast
  * codebook (the exact arithmetic of the driver path), and the
  * per-cluster mean accumulates through the native
  * [[org.apache.spark.sql.graft.VectorSum]] partial aggregate — so the
  * shuffle per iteration carries at most `partitions × k` dim-sized
  * buffers and the driver materializes exactly k (sum, count) rows per
  * iteration: the size of the RESULT, never the data.
  *
  * Deterministic: initial centroids are the k first rows by
  * `(xxhash64(vec, seed), vec)` — a TakeOrdered, not a global sort — and
  * iterations are order-insensitive up to float-summation rounding.
  * Empty clusters keep their previous centroid (the driver-path rule).
  */
object KMeans {

  /** Train k centroids over `vecs(vecCol)` (array<float>). Returns
    * min(k, rows) centroids; `what` names the caller in errors.
    *
    * `twoLevelAssign` runs each iteration's assignment through a
    * [[twoLevelIndex]] over the current centroids — O(√k·dim) per row
    * instead of O(k·dim), the knob that keeps a 10⁵-cluster TRAINING
    * pass linear in the corpus (the assign is the only per-row work).
    * Approximate at cell boundaries (Lloyd still converges — mini-batch
    * and online k-means tolerate far larger assignment noise).
    */
  def train(
      vecs: DataFrame,
      vecCol: String,
      k: Int,
      iters: Int,
      seed: Int,
      what: String = "KMeans.train",
      twoLevelAssign: Boolean = false,
      twoLevelProbes: Int = 4,
      miniBatchFraction: Double = 1.0): Array[Array[Float]] = {
    require(k > 0, s"$what: k must be positive, got $k")
    require(miniBatchFraction > 0 && miniBatchFraction <= 1.0,
      s"$what: miniBatchFraction must be in (0,1], got $miniBatchFraction")
    val spark = vecs.sparkSession
    val cached = graft.util.Par.balance(
      vecs.select(col(vecCol).cast("array<float>").as("__v"))
        .filter(col("__v").isNotNull))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // distinct BEFORE the hash-ordered take: identical vectors hash
      // identically and sort ADJACENT, so a duplicate-heavy corpus would
      // otherwise fill the init with copies of one point (k−1 dead
      // clusters); init size is min(k, distinct vectors)
      val init = cached
        .dropDuplicates("__v")
        .orderBy(xxhash64(col("__v"), lit(seed)), col("__v"))
        .limit(k)
        .collect()
        .map(rowVec)
      require(init.nonEmpty, s"$what: no input vectors")
      val kernelFor: Array[Array[Float]] => org.apache.spark.sql.graft.CentroidIndex =
        if (twoLevelAssign) cs => twoLevelIndex(spark, cs, twoLevelProbes, seed = seed)
        else cs => new org.apache.spark.sql.graft.CentroidKernel(
          spark.sparkContext.broadcast(cs))
      lloyd(cached, init, iters, kernelFor, miniBatchFraction, seed)
    } finally { cached.unpersist(blocking = false); () }
  }

  /** The distributed Lloyd body given explicit initial centroids — the
    * parity hook against [[ApproxKnn.lloydDriver]]: same assignment rule
    * (codegen kernel, ties to the lowest index), same double-accumulated
    * float sums, differing from the driver only in summation ORDER (float
    * rounding). `cached` must be a single-`__v`-column frame the caller
    * has persisted (each iteration re-scans it).
    */
  private[graft] def lloyd(
      cached: DataFrame,
      init: Array[Array[Float]],
      iters: Int): Array[Array[Float]] = {
    val spark = cached.sparkSession
    lloyd(cached, init, iters,
      cs => new org.apache.spark.sql.graft.CentroidKernel(
        spark.sparkContext.broadcast(cs)))
  }

  /** `miniBatchFraction < 1` runs each iteration over a deterministic
    * per-iteration hash sample of the training frame (stochastic Lloyd —
    * fresh coin per iteration, so the union of batches covers the corpus
    * across iterations): the per-iteration cost knob when even ONE full
    * pass per iteration is too much. Deterministic: the sample is a pure
    * function of (vector, seed, iteration). Empty clusters — more common
    * under sampling — keep their previous centroid, as in the full pass.
    */
  private[graft] def lloyd(
      cached: DataFrame,
      init: Array[Array[Float]],
      iters: Int,
      kernelFor: Array[Array[Float]] => org.apache.spark.sql.graft.CentroidIndex,
      miniBatchFraction: Double = 1.0,
      seed: Int = 42): Array[Array[Float]] = {
    var centroids = init
    for (iter <- 1 to iters) {
      val kernel = kernelFor(centroids)
      val src =
        if (miniBatchFraction >= 1.0) cached
        else cached.filter(
          pmod(xxhash64(col("__v"), lit(seed), lit(iter)), lit(10000L)) <
            lit((miniBatchFraction * 10000).round))
      val rows = src
        .groupBy(graft.functions.VectorExpressions
          .nearestCentroid(col("__v"), kernel).as("cid"))
        .agg(graft.functions.AggExpressions.vectorSum(col("__v")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = new Array[Array[Float]](centroids.length)
      System.arraycopy(centroids, 0, next, 0, centroids.length)
      rows.foreach { r =>
        val cid = r.getInt(0)
        val sums = r.getSeq[Double](1)
        val n = r.getLong(2)
        val c = new Array[Float](sums.length)
        var i = 0
        while (i < c.length) { c(i) = (sums(i) / n).toFloat; i += 1 }
        next(cid) = c
      }
      centroids = next
      // this iteration's job is complete (collect returned) — destroy its
      // codebook broadcasts NOW rather than letting a long run (many
      // iterations × 10⁵-centroid codebooks, up to 3 broadcasts each
      // under twoLevelAssign) accumulate driver/executor broadcast
      // memory until the ContextCleaner's GC-driven sweep fires
      kernel.release()
    }
    centroids
  }

  /** Build a [[org.apache.spark.sql.graft.TwoLevelCentroidKernel]] over a
    * trained codebook: coarse cells = driver Lloyd over the k centroids
    * (codebook-sized work, never data-sized), member lists = exact
    * assignment of each fine centroid to its cell. `coarseCells` 0 →
    * ~√k cells (the arithmetic optimum when probe cost ≈ member cost).
    */
  def twoLevelIndex(
      spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Float]],
      probes: Int = 4,
      coarseCells: Int = 0,
      seed: Int = 42): org.apache.spark.sql.graft.TwoLevelCentroidKernel = {
    require(centroids.nonEmpty, "twoLevelIndex: empty codebook")
    val k = centroids.length
    val kc = if (coarseCells > 0) math.min(coarseCells, k)
      else math.max(1, math.round(math.sqrt(k.toDouble)).toInt)
    val coarse = ApproxKnn.kmeans(centroids, kc, iters = 5, seed)
    val members = Array.fill(coarse.length)(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    var fi = 0
    while (fi < k) {
      val c = centroids(fi)
      var best = 0
      var bestD = Double.MaxValue
      var ci = 0
      while (ci < coarse.length) {
        val cc = coarse(ci)
        val m = math.min(cc.length, c.length)
        var d = 0.0
        var j = 0
        while (j < m) { val x = c(j) - cc(j); d += x * x; j += 1 }
        if (d < bestD) { bestD = d; best = ci }
        ci += 1
      }
      members(best) += fi
      fi += 1
    }
    new org.apache.spark.sql.graft.TwoLevelCentroidKernel(
      spark.sparkContext.broadcast(centroids),
      spark.sparkContext.broadcast(coarse),
      spark.sparkContext.broadcast(members.map(_.toArray)),
      math.max(1, probes))
  }

  /** Mean squared distance to the nearest centroid — the quantization
    * cost that tunes k / iters (the elbow diagnostic) and watches drift
    * on appended corpora (rising cost against a fixed codebook = time to
    * rebuild). ONE aggregation over the frame through the same codegen
    * assign kernel as training; nothing but the scalar comes back.
    */
  def cost(
      vecs: DataFrame,
      vecCol: String,
      centroids: Array[Array[Float]],
      twoLevelAssign: Boolean = false,
      twoLevelProbes: Int = 4,
      seed: Int = 42): Double = {
    require(centroids.nonEmpty, "KMeans.cost: empty codebook")
    val spark = vecs.sparkSession
    val kernel: org.apache.spark.sql.graft.CentroidIndex =
      if (twoLevelAssign) twoLevelIndex(spark, centroids, twoLevelProbes, seed = seed)
      else new org.apache.spark.sql.graft.CentroidKernel(
        spark.sparkContext.broadcast(centroids))
    try {
      val rows = vecs
        .select(col(vecCol).cast("array<float>").as("__v"))
        .filter(col("__v").isNotNull)
        .agg(avg(graft.functions.VectorExpressions
          .nearestCentroidDist(col("__v"), kernel)).as("c"))
        .collect()
      if (rows.isEmpty || rows.head.isNullAt(0)) 0.0 else rows.head.getDouble(0)
    } finally
      // the lloyd rationale: cost's documented use is REPEATED calls (an
      // elbow sweep, periodic drift-watching) with 10⁴–10⁵-centroid
      // codebooks — eager release instead of stranding up to three large
      // broadcasts per call until a GC-driven ContextCleaner sweep
      kernel.release()
  }

  private def rowVec(r: Row): Array[Float] = {
    val s = r.getSeq[Float](0)
    val a = new Array[Float](s.length)
    var i = 0
    while (i < a.length) { a(i) = s(i); i += 1 }
    a
  }
}
