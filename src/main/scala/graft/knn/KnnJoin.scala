package graft.knn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Dist

/** kNN join — the reference's flagship operator (FAISS `IndexFlatL2` build +
  * search, SemLink/join_discoverer.py:255–301; hnswlib variant,
  * DeepJoin/annIndex.py:12–40), re-expressed as a relational operator:
  * for each query vector, the k nearest candidate vectors with their
  * distance and rank.
  *
  * Strategy escalation (SURVEY.md §7.3):
  *  - [[windowKnn]]: cross join + distance expression + ranking window.
  *    Exact; fine for metadata-sized inputs (≤ ~10⁴ rows). Serves as the
  *    correctness oracle for the fast path.
  *  - [[broadcastKnn]]: broadcast the query side as primitive float arrays;
  *    one `mapPartitions` pass over candidates keeps a bounded per-query
  *    top-k (partial top-k per partition), then a final ranking window over
  *    only |partitions|·|Q|·k rows merges partials. No N² rows ever hit a
  *    shuffle — this is the 100 TB path for |Q| up to ~10⁶ (a 64-d float
  *    query set of 10⁶ rows broadcasts at ~256 MB). Beyond that: block the
  *    query side and union per-block results (same operator, outer loop),
  *    or switch to LSH/IVF pruning (planned round 2+).
  *
  * Distances: squared L2 (stored squared, FAISS convention) or cosine
  * distance. Ties broken by neighbor id ascending — deterministic output.
  */
object KnnJoin {

  val MetricL2Sq = "l2sq"
  val MetricCosine = "cosine"

  /** Distances use the native codegen expressions
    * ([[graft.functions.VectorExpressions]]); [[graft.functions.Dist]]'s
    * higher-order-function forms are the interpreted correctness oracle.
    */
  private def distExpr(metric: String, a: Column, b: Column): Column = metric match {
    case MetricL2Sq   => graft.functions.VectorExpressions.squaredL2(a, b)
    case MetricCosine => graft.functions.VectorExpressions.cosineDistance(a, b)
    case m            => throw new IllegalArgumentException(s"unknown metric: $m")
  }

  /** Exact kNN via cross join + window. `queries`/`candidates`: two-column
    * frames (id, vec). Output: (query_id, neighbor_id, dist, rank), rank
    * 1..k per query ordered by (dist, neighbor_id).
    */
  def windowKnn(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      metric: String = MetricL2Sq,
      excludeSelf: Boolean = true): DataFrame = {
    // ids cast to long like every other strategy — the oracle and the
    // fast paths must emit the SAME schema or recall checks that union
    // or join the two hit type mismatches
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("__qv"))
    val c = candidates.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("__cv"))
    val joined = q.crossJoin(c)
    val filtered =
      if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id")) else joined
    HnswSearch.topKMerge(
      filtered
        .withColumn("dist", distExpr(metric, col("__qv"), col("__cv")))
        .select("query_id", "neighbor_id", "dist"),
      k)
  }

  // min-clamped like every other distance kernel in the engine (codegen
  // SquaredL2/DotProduct, KnnJoinExec, HnswGraph, PQ zero-padding): a
  // short vector compares on the shared prefix instead of crashing the
  // task with an index error
  private def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  // bounded per-query top-k accumulator — shared with the plan-node exec
  private type TopK = org.apache.spark.sql.graft.TopKBuf

  /** Scalable exact kNN: broadcast queries, partial top-k per candidate
    * partition, window merge. Same contract as [[windowKnn]].
    */
  def broadcastKnn(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      metric: String = MetricL2Sq,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._

    val qRows: Array[(Long, Array[Float])] = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    require(qRows.nonEmpty, "broadcastKnn: empty query side")
    val cosine = HnswSearch.isCosine(metric)
    val bc = spark.sparkContext.broadcast(qRows)

    val partials = graft.util.Par.balance(
      candidates.select(col(idCol).cast("long"), col(vecCol).cast("array<float>")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val q = bc.value
        val n = q.length
        val qIds = new Array[Long](n)
        val qVecs = new Array[Array[Float]](n)
        val qNorms = new Array[Double](n)
        var i = 0
        while (i < n) {
          qIds(i) = q(i)._1; qVecs(i) = q(i)._2
          if (cosine) qNorms(i) = norm(qVecs(i))
          i += 1
        }
        val heaps = Array.fill(n)(new TopK(k))
        it.foreach { case (cid, cvec) =>
          val cNorm = if (cosine) norm(cvec) else 0.0
          var j = 0
          while (j < n) {
            if (!(excludeSelf && qIds(j) == cid)) {
              val d =
                if (cosine) {
                  val den = qNorms(j) * cNorm
                  if (den > 0) 1.0 - dot(qVecs(j), cvec) / den else 1.0
                } else l2sq(qVecs(j), cvec)
              heaps(j).offer(d, cid)
            }
            j += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          (0 until h.size).iterator.map(r => (qIds(qi), h.ids(r), h.dists(r)))
        }
      }
      .toDF("query_id", "neighbor_id", "dist")

    HnswSearch.topKMerge(partials, k)
  }
}
