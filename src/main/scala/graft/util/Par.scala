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

  // CALLER CONTRACT: feed scans (or already-materialized frames), not
  // unexecuted shuffle pipelines — df.rdd finalizes the plan, so under
  // AQE a frame with pending exchanges would execute its upstream stages
  // here just to learn the partition count, and again on the real
  // action. Every in-repo call site is a scan/select or a checkpointed
  // frame, where the probe is metadata-only.
  def balance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
