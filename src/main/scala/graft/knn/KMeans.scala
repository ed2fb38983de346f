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
    */
  def train(
      vecs: DataFrame,
      vecCol: String,
      k: Int,
      iters: Int,
      seed: Int,
      what: String = "KMeans.train"): Array[Array[Float]] = {
    require(k > 0, s"$what: k must be positive, got $k")
    val cached = graft.util.Par.balance(
      vecs.select(col(vecCol).cast("array<float>").as("__v"))
        .filter(col("__v").isNotNull))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val init = cached
        .orderBy(xxhash64(col("__v"), lit(seed)), col("__v"))
        .limit(k)
        .collect()
        .map(rowVec)
      require(init.nonEmpty, s"$what: no input vectors")
      lloyd(cached, init, iters)
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
    var centroids = init
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val kernel = new org.apache.spark.sql.graft.CentroidKernel(bc)
      val rows = cached
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
      bc.destroy()
    }
    centroids
  }

  private def rowVec(r: Row): Array[Float] = {
    val s = r.getSeq[Float](0)
    val a = new Array[Float](s.length)
    var i = 0
    while (i < a.length) { a(i) = s(i); i += 1 }
    a
  }
}
