package graft.knn

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
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
  *    a partition-pruned scan that never touches the other lists' files.
  *
  * Build once, search many times from any session — the same contract as
  * the reference's save/load, with the probe pruning enforced by the
  * storage layout instead of an in-memory structure.
  */
object IvfIndex {

  /** Train the coarse quantizer on a bounded sample and persist the index
    * layout. Returns the centroid count actually used.
    */
  def build(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nList: Int = 16,
      kmeansIters: Int = 5,
      sampleCap: Int = 20000,
      seed: Int = 42): Int = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val sample = candidates.select(col(vecCol).cast("array<float>"))
      .limit(sampleCap).as[Array[Float]].collect()
    require(sample.nonEmpty, "IvfIndex.build: empty candidate side")
    val centroids = ApproxKnn.kmeans(sample,
      math.min(nList, sample.length), kmeansIters, seed)
    val bc = spark.sparkContext.broadcast(centroids)

    val nearest = F.udf { (v: Seq[Float]) =>
      val cs = bc.value
      val arr = v.toArray
      var best = 0
      var bestD = Double.MaxValue
      var cIdx = 0
      while (cIdx < cs.length) {
        val c = cs(cIdx)
        var d = 0.0
        var i = 0
        val m = math.min(c.length, arr.length)
        while (i < m) { val x = arr(i) - c(i); d += x * x; i += 1 }
        if (d < bestD) { bestD = d; best = cIdx }
        cIdx += 1
      }
      best
    }

    centroids.zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq.toDF("cid", "vec")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")

    graft.util.Par.balance(
      candidates.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec")))
      .withColumn("cid", nearest(col("vec")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cid")
      .parquet(s"$dir/assignments")
    centroids.length
  }

  /** Probe the persisted index: for each query, the `nProbe` nearest
    * centroids are computed against the (tiny, collected) centroid table,
    * and the scan of `assignments/` carries a `cid IN (...)` partition
    * filter — only the probed lists' files are read. Output contract
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
      excludeSelf: Boolean = true): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$dir/centroids")
      .select(col("cid"), col("vec").cast("array<float>"))
      .as[(Int, Array[Float])].collect().sortBy(_._1).map(_._2)
    require(centroids.nonEmpty, s"IvfIndex.search: no centroids under $dir")
    val bc = spark.sparkContext.broadcast(centroids)
    val probeCids = F.udf { (v: Seq[Float], n: Int) =>
      val cs = bc.value
      val arr = v.toArray
      cs.indices.map { cIdx =>
        val c = cs(cIdx)
        var d = 0.0
        var i = 0
        val m = math.min(c.length, arr.length)
        while (i < m) { val x = arr(i) - c(i); d += x * x; i += 1 }
        (d, cIdx)
      }.sortBy(identity).take(n).map(_._2)
    }

    val probed = graft.util.Par.balance(
      queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<float>").as("__query_vec")))
      .withColumn("cid", explode(probeCids(col("__query_vec"), lit(nProbe))))

    // static IN-filter on the partition column: the probed cid UNION is at
    // most nList values (collect is bounded by the centroid count, never
    // the data), and the filter prunes unprobed list directories at the
    // file-listing level — guaranteed, not dependent on dynamic pruning
    val probedCids = probed.select("cid").distinct().as[Int].collect()
    val lists = spark.read.parquet(s"$dir/assignments")
      .filter(col("cid").isin(probedCids.map(Integer.valueOf).toSeq: _*))
      .select(col("cid"), col("id").as("neighbor_id"),
        col("vec").as("__neighbor_vec"))

    val joined = probed.join(lists, Seq("cid"))
    val pairs =
      if (excludeSelf) joined.filter(col("query_id") =!= col("neighbor_id"))
      else joined
    val w = Window.partitionBy("query_id").orderBy(asc("dist"), asc("neighbor_id"))
    pairs
      .withColumn("dist", graft.functions.VectorExpressions.squaredL2(
        col("__query_vec"), col("__neighbor_vec")))
      .select("query_id", "neighbor_id", "dist")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
