package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelism repair for CPU-bound stages.
  *
  * A small parquet file arrives as ONE input partition, so an expensive
  * per-row stage (regex-heavy parsing, signature UDFs, kNN inner loops)
  * runs single-threaded no matter how many cores exist. `balance` widens
  * such inputs to the cluster's default parallelism — and deliberately
  * does NOTHING when the input already has enough partitions, so at real
  * scale (where scans come pre-partitioned) no extra shuffle is added.
  */
object Par {

  def balance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
