package graft.knn

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent sharded HNSW index — the graph-ANN counterpart of
  * [[IvfIndex]]'s index-as-data layout (reference: hnswlib
  * `save_index`/`load_index`, DeepJoin/annIndex.py:42–51, a single-machine
  * byte blob; here the graph state IS a table):
  *
  *  - `nodes/` — one parquet row per graph node:
  *    (shard, pos, id, vec, links: array<array<int>>), `pos` the
  *    insertion position within its shard, links holding neighbor
  *    positions per level;
  *  - `params/` — one row (m, metric, shards, ef_construction): the
  *    hyperparameters the graphs were built under. Search reads them
  *    from the index itself — a caller cannot mismatch the build.
  *
  * Shard assignment is a deterministic hash of the id (stable across
  * builds and loads, independent of input partitioning), and insertion
  * order within a shard is id-ascending — so the persisted index is
  * byte-deterministic for a given dataset. Search restores each shard's
  * graph EXACTLY ([[HnswGraph.restore]] — adjacency, entry point, top
  * level) and runs the same [[HnswSearch]] broadcast-query beam as
  * [[ApproxKnn.hnswKnn]]; a restored index answers identically to the
  * index that was saved.
  */
object HnswIndex {

  /** Build the per-shard graphs and persist them as node rows. Returns
    * the node count written.
    */
  def build(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      m: Int = 16,
      efConstruction: Int = 100,
      metric: String = KnnJoin.MetricL2Sq,
      shards: Int = 16,
      seed: Int = 42): Long = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cosine = HnswSearch.isCosine(metric)
    candidates
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .withColumn("shard", pmod(xxhash64(col("id")), lit(shards)).cast("int"))
      // one builder sees one shard's rows contiguously, in id order —
      // deterministic graphs regardless of source layout
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        it.toSeq.groupBy(_._3).iterator.flatMap { case (shard, rows) =>
          val g = new HnswGraph(m, efConstruction, cosine, seed)
          rows.foreach { case (id, vec, _) => g.insert(id, vec) }
          g.nodes.iterator.zipWithIndex.map { case ((id, vec, links), pos) =>
            (shard, pos, id, vec, links)
          }
        }
      }
      .toDF("shard", "pos", "id", "vec", "links")
      .repartition(col("shard"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard") // one directory per shard: append rewrites
      .parquet(s"$dir/nodes") // only the shards it touches
    Seq((m, metric, shards, efConstruction, seed))
      .toDF("m", "metric", "shards", "ef_construction", "seed")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/params")
    spark.read.parquet(s"$dir/nodes").count()
  }

  private def loadParams(spark: SparkSession, dir: String)
      : (Int, String, Int, Int, Int) = {
    val rows = spark.read.parquet(s"$dir/params")
      .select("m", "metric", "shards", "ef_construction", "seed").collect()
    require(rows.length == 1, s"HnswIndex: malformed params under $dir")
    (rows.head.getInt(0), rows.head.getString(1), rows.head.getInt(2),
      rows.head.getInt(3), rows.head.getInt(4))
  }

  /** Append new vectors WITHOUT rebuilding the whole index: each new
    * vector routes to its deterministic shard, the affected shards'
    * graphs are restored and the new elements inserted incrementally
    * (hnswlib `add_items` semantics — graph insertion is order-dependent,
    * so an appended index is a valid HNSW over the union but not
    * byte-identical to a from-scratch build), and ONLY those shard
    * directories are rewritten — untouched shards' files are not read or
    * written. Hyperparameters come from `params/`. Returns the appended
    * row count.
    */
  def append(
      spark: SparkSession,
      dir: String,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String): Long = {
    import spark.implicits._
    val (m, metric, shards, efConstruction, seed) = loadParams(spark, dir)
    val cosine = HnswSearch.isCosine(metric)
    val fresh = newVectors
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .withColumn("shard", pmod(xxhash64(col("id")), lit(shards)).cast("int"))
      .cache()
    try {
      val touched = fresh.select("shard").distinct().as[Int].collect().sorted
      if (touched.isEmpty) return 0L
      val nNew = fresh.count()
      // duplicate labels are rejected, matching hnswlib add_items: a
      // silent double-insert would persist two nodes with one external id
      // and search would return that neighbor twice within top-k
      require(fresh.groupBy("id").count().filter(col("count") > 1).isEmpty,
        "HnswIndex.append: duplicate ids within the appended batch")

      val existing = spark.read.parquet(s"$dir/nodes")
        .filter(col("shard").isin(touched.map(Integer.valueOf).toSeq: _*))
        .select(col("shard"), col("pos"), col("id"), col("vec").cast("array<float>"),
          col("links").cast("array<array<int>>"))
        .as[(Int, Int, Long, Array[Float], Seq[Seq[Int]])]
      require(existing.select("id")
        .join(fresh.select("id"), "id").isEmpty,
        "HnswIndex.append: id already present in the index")
      val rebuilt = existing
        .groupByKey(_._1)
        .cogroup(fresh.select(col("shard"), col("id"), col("vec"))
          .as[(Int, Long, Array[Float])].groupByKey(_._1)) {
          (shard, oldIt, newIt) =>
            val olds = oldIt.toSeq.sortBy(_._2) // original insertion order
            val g = HnswGraph.restore(m, cosine,
              olds.map { case (_, _, id, vec, links) => (id, vec, links) },
              efConstruction, seed)
            newIt.toSeq.sortBy(_._2).foreach { case (_, id, vec) => g.insert(id, vec) }
            g.nodes.iterator.zipWithIndex.map { case ((id, vec, links), pos) =>
              (shard, pos, id, vec, links)
            }
        }
        .toDF("shard", "pos", "id", "vec", "links")
        .repartition(col("shard"))
      // rewrite ONLY the touched shard directories; the writer-scoped
      // option (not the session conf — a shared session must not see an
      // order-dependent mode change) selects dynamic overwrite
      rebuilt.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard")
        .parquet(s"$dir/nodes")
      nNew
    } finally fresh.unpersist()
  }

  /** Probe the persisted index: every shard's graph is restored in place
    * (one pass over `nodes/`, no re-insertion), the broadcast query set
    * beams through it, and per-shard top-k partials merge in one ranking
    * window — the [[ApproxKnn.hnswKnn]] execution over restored state.
    * `m` and the metric come from the persisted `params/`, never from the
    * caller.
    */
  def search(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      efSearch: Int = 64,
      excludeSelf: Boolean = true): DataFrame = {
    import spark.implicits._
    val (m, metric, _, _, _) = loadParams(spark, dir)
    val cosine = HnswSearch.isCosine(metric)
    val bc = spark.sparkContext.broadcast(
      HnswSearch.collectQueries(queries, idCol, vecCol, "HnswIndex.search"))
    val (kL, efS, ex) = (k, efSearch, excludeSelf)

    val partials = spark.read.parquet(s"$dir/nodes")
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "pos")
      .select(col("shard"), col("id"), col("vec").cast("array<float>"),
        col("links").cast("array<array<int>>"))
      .as[(Int, Long, Array[Float], Seq[Seq[Int]])]
      .mapPartitions { it =>
        it.toSeq.groupBy(_._1).iterator.flatMap { case (_, rows) =>
          val g = HnswGraph.restore(m, cosine,
            rows.map { case (_, id, vec, links) => (id, vec, links) })
          HnswSearch.beamAll(g, bc.value, kL, efS, ex)
        }
      }
      .toDF("query_id", "neighbor_id", "dist")

    HnswSearch.topKMerge(partials, k)
  }
}
