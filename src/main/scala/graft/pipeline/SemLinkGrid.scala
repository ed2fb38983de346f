package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.discover.{Discovery, Eval}
import graft.embed.{Embedder, HashEmbedder}
import graft.knn.KnnJoin
import graft.profile.Profiler
import graft.sources.Lake

/** The reference's evaluation grid (SemLink/join_discoverer.py:454–518):
  * sweep k ∈ {5,10,25} × threshold ∈ {0.1..0.4}, reporting P/R/F1 and
  * NDCG@k per cell against a ground-truth pair relation.
  *
  * The reference recomputes the FAISS search for every threshold although
  * distances depend only on k (join_discoverer.py:485–498) — here the kNN
  * Dataset is computed ONCE per k (for the max k, then filtered by rank)
  * and cached; thresholds are pure filters over it (SURVEY.md §4.1).
  */
object SemLinkGrid {

  /** One grid cell row:
    * (k, threshold, tp, fp, fn, precision, recall, f1, ndcg).
    */
  def evaluationGrid(
      spark: SparkSession,
      dir: String,
      groundTruth: DataFrame, // (query_table, query_column, candidate_table, candidate_column)
      ks: Seq[Int] = Seq(5, 10, 25),
      thresholds: Seq[Double] = Seq(0.1, 0.2, 0.3, 0.4),
      embedder: Embedder = HashEmbedder(),
      tables: Seq[String] = Lake.lakeTables): DataFrame = {
    import graft.functions.TextFns

    val profiles = Profiler.profileLake(spark, dir, tables)
    val embedded = SemLink.columnTexts(profiles)
      .withColumn("vec", embedder.embedColumn(col("text")))
      .select("key", "vec")
      .cache()

    // symmetric GT on composite keys (join_discoverer.py:392–397)
    val truth = Discovery.symmetrizeGroundTruth(
      groundTruth.select(
        TextFns.columnKey(col("query_table"), col("query_column")).as("q"),
        TextFns.columnKey(col("candidate_table"), col("candidate_column")).as("c")),
      "q", "c").cache()

    val kMax = ks.max
    // ONE kNN pass at kMax; every (k, t) cell is a filter over it
    val knn = KnnJoin.windowKnn(embedded, embedded, "key", "vec", kMax).cache()
    knn.count() // materialize once

    val cells = for (k <- ks; t <- thresholds) yield {
      val topK = knn.filter(col("rank") <= k)
      val discovered = Discovery.thresholdFilter(topK, "dist", t)
        .select(col("query_id").as("query"), col("neighbor_id").as("candidate"))
      val prf = Eval.microPrf1(discovered, truth)
      val ndcg = Eval.ndcgAtK(
        topK.select(col("query_id").as("query"),
          col("neighbor_id").as("candidate"), col("rank")),
        truth, k)
      prf.crossJoin(ndcg.select("ndcg"))
        .withColumn("k", lit(k))
        .withColumn("threshold", lit(t))
        .select("k", "threshold", "tp", "fp", "fn",
          "precision", "recall", "f1", "ndcg")
    }
    cells.reduce(_.unionByName(_))
  }
}
