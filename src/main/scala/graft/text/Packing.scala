package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-data preparation (added scope): greedy
  * first-overflow packing of documents into fixed-budget sequences — the
  * standard step between a cleaned corpus and a training run (concatenate
  * docs up to the context length; a doc that would overflow starts the
  * next sequence; an oversized doc gets a sequence of its own).
  *
  * Packing is inherently sequential, so it runs PER GROUP: within each
  * `groupCol` value, documents are processed in ascending `idCol` order
  * by one streaming pass (`flatMapSortedGroups` — Spark sorts within the
  * group shuffle; the group is consumed as an iterator, never
  * materialized). Parallelism = number of groups; choose the group grain
  * (source, shard, date) so single groups are processing-bounded — the
  * same contract every packing implementation at scale has, made
  * explicit. State per group is two longs.
  *
  * Deterministic: (group, id) totally orders the input, so sequence ids
  * are reproducible across runs and partitionings.
  *
  * Output: (group, id, size, seq_id) — seq_id is 0-based per group.
  */
object Packing {

  def packGreedy(
      df: DataFrame,
      idCol: String,
      sizeCol: String,
      groupCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "packGreedy: budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("group"),
        col(idCol).cast("long").as("id"),
        col(sizeCol).cast("long").as("size"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"id") { (group, rows) =>
        var fill = 0L
        var seq = 0L
        var first = true
        rows.map { case (_, id, size) =>
          if (!first && fill + size > budget) { seq += 1; fill = size }
          else { fill += size; first = false }
          (group, id, size, seq)
        }
      }
      .toDF("group", "id", "size", "seq_id")
  }

  /** Per-sequence summary view of [[packGreedy]]: document count and
    * total size per packed sequence — the frame a training loader reads.
    */
  def packedSequences(packed: DataFrame): DataFrame =
    packed.groupBy("group", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("size").as("total_size"))
}
