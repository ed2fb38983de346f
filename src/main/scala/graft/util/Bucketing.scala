package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers (SURVEY.md scale posture: "bucketing for
  * co-located joins"). Two tables bucketed by the same key into the same
  * bucket count join WITHOUT a shuffle exchange on either side — at 100 TB
  * this turns the repeated fact-to-fact join from two full shuffles into a
  * local zip of pre-sorted buckets. Worth paying the one-time bucketed
  * write for any join key used repeatedly (e.g. the profile catalog's
  * (table, column), or orderkey between orders and lineitem).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external table at `path`. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int,
      path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName)

  def readTable(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
