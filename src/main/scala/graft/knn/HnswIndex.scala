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
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/nodes")
    Seq((m, metric, shards, efConstruction))
      .toDF("m", "metric", "shards", "ef_construction")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/params")
    spark.read.parquet(s"$dir/nodes").count()
  }

  private def loadParams(spark: SparkSession, dir: String): (Int, String) = {
    val rows = spark.read.parquet(s"$dir/params")
      .select("m", "metric").collect()
    require(rows.length == 1, s"HnswIndex: malformed params under $dir")
    (rows.head.getInt(0), rows.head.getString(1))
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
    val (m, metric) = loadParams(spark, dir)
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
