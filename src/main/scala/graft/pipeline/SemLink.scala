package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.discover.Discovery
import graft.embed.{Embedder, HashEmbedder}
import graft.functions.TextFns
import graft.knn.KnnJoin
import graft.profile.Profiler
import graft.sources.Lake

/** The flagship end-to-end pipeline (reference entry point
  * `python SemLink/semlink.py`, SURVEY.md §3.1): profile the lake →
  * serialize every column to text → embed → exact kNN join over the
  * embedding space → distance-threshold filter → joinable column pairs.
  *
  * Every stage is a lazy Dataset transform — Catalyst fuses the projection
  * chain, and the expensive embedding projection is cached before the kNN
  * stage (replacing the reference's file-level memoization,
  * join_discoverer.py:189–197).
  */
object SemLink {

  /** Column catalog with the `"table:column"` key and the serialized
    * column sentence (F6).
    */
  def columnTexts(profiles: DataFrame): DataFrame =
    profiles.select(
      TextFns.columnKey(col("table"), col("column")).as("key"),
      TextFns.truncateTokens(
        TextFns.columnToText(
          lit(""), col("column"), col("num_values"),
          col("min_len"), col("max_len"), col("avg_len"),
          col("values_sample"))).as("text"))

  /** Full discovery run at (k, t): JoinablePair frame
    * (t1, c1, t2, c2, distance_anns), globally sorted by distance
    * (join_discoverer.py:299).
    */
  def discover(
      spark: SparkSession,
      dir: String,
      k: Int = 5,
      threshold: Double = 1.0,
      embedder: Embedder = HashEmbedder(),
      tables: Seq[String] = Lake.lakeTables): DataFrame = {
    val profiles = Profiler.profileLake(spark, dir, tables)
    val embedded = columnTexts(profiles)
      .withColumn("vec", embedder.embedColumn(col("text")))
      .select("key", "vec")
      .cache()
    val knn = KnnJoin.windowKnn(embedded, embedded, "key", "vec", k,
      KnnJoin.MetricL2Sq, excludeSelf = true)
    val filtered = Discovery.thresholdFilter(
      knn.withColumnRenamed("query_id", "column_1")
        .withColumnRenamed("neighbor_id", "column_2")
        .withColumnRenamed("dist", "distance_anns"),
      "distance_anns", threshold)
    Discovery.toJoinablePairs(filtered, "column_1", "column_2", "distance_anns")
      .orderBy("distance_anns", "t1", "c1", "t2", "c2")
  }
}
