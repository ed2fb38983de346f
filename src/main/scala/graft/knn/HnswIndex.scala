package graft.knn

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent sharded HNSW index — the graph-ANN counterpart of
  * [[IvfIndex]]'s index-as-data layout (reference: hnswlib
  * `save_index`/`load_index`, DeepJoin/annIndex.py:42–51, a single-machine
  * byte blob; here the graph state IS a table):
  *
  *  - `nodes/` — one parquet row per graph node:
  *    (shard, pos, id, vec, links: array<array<int>>), `pos` the
  *    insertion position within its shard, links holding neighbor
  *    positions per level.
  *
  * Shard assignment is a deterministic hash of the id (stable across
  * builds and loads, independent of input partitioning), and insertion
  * order within a shard is id-ascending — so the persisted index is
  * byte-deterministic for a given dataset. Search restores each shard's
  * graph EXACTLY ([[HnswGraph.restore]] — adjacency, entry point, top
  * level) and runs the same broadcast-query beam as
  * [[ApproxKnn.hnswKnn]]; a restored index answers identically to the
  * index that was saved.
  */
object HnswIndex {

  private def normalized(df: DataFrame, idCol: String, vecCol: String,
      shards: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .withColumn("shard", pmod(xxhash64(col("id")), lit(shards)).cast("int"))

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
    val cosine = metric == KnnJoin.MetricCosine
    val n = normalized(candidates, idCol, vecCol, shards)
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
    spark.read.parquet(s"$dir/nodes").count()
  }

  /** Probe the persisted index: every shard's graph is restored in place
    * (one pass over `nodes/`, no re-insertion), the broadcast query set
    * beams through it, and per-shard top-k partials merge in one ranking
    * window — the [[ApproxKnn.hnswKnn]] execution over restored state.
    */
  def search(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      efSearch: Int = 64,
      m: Int = 16,
      metric: String = KnnJoin.MetricL2Sq,
      excludeSelf: Boolean = true): DataFrame = {
    import spark.implicits._
    val cosine = metric == KnnJoin.MetricCosine
    val qRows: Array[(Long, Array[Float])] = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    require(qRows.nonEmpty, "HnswIndex.search: empty query side")
    val bc = spark.sparkContext.broadcast(qRows)
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
          bc.value.iterator.flatMap { case (qid, qv) =>
            g.search(qv, kL + (if (ex) 1 else 0), math.max(efS, kL + 1))
              .iterator
              .filter { case (nid, _) => !(ex && nid == qid) }
              .take(kL)
              .map { case (nid, d) => (qid, nid, d) }
          }
        }
      }
      .toDF("query_id", "neighbor_id", "dist")

    val w = Window.partitionBy("query_id").orderBy(asc("dist"), asc("neighbor_id"))
    partials
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
