package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{EmbeddingTransport, LlmPolicy}

/** LLM-backed [[Embedder]] (reference: the external embedding model calls
  * at SemLink/join_discoverer.py:161–165, throttled at :244). The wire
  * call is injected ([[EmbeddingTransport]]) so the operator is
  * offline-testable.
  *
  * [[embed]] satisfies the per-string trait contract (single-text call
  * under the throttle/retry policy). The scale path is [[embedDataset]]:
  * partition-batched — each throttled HTTP round trip carries `batchSize`
  * texts, one transport instance per partition, so cost is
  * rows/batchSize calls instead of rows calls.
  */
final case class LlmEmbedder(
    transport: EmbeddingTransport,
    dim: Int,
    policy: LlmPolicy = LlmPolicy(),
    batchSize: Int = 64) extends Embedder {

  override def embed(text: String): Array[Float] =
    policy.call(transport.embed(Seq(Option(text).getOrElse(""))).head)

  /** Batched embedding of `textCol`, appended as `outCol`
    * (`array<float>`). A failed batch (after the policy's retry) fails the
    * task — embedding loss is not silently tolerated on the data path.
    */
  def embedDataset(df: DataFrame, textCol: String, outCol: String = "vec"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val t = transport
    val p = policy
    val bs = batchSize
    // localCheckpoint materializes the id assignment ONCE: both join sides
    // read the same evaluated RDD, so ids cannot diverge between them
    // (monotonically_increasing_id is not stable across re-evaluations of
    // a shuffled input — a silent row/vector mispairing otherwise)
    val withId = df.withColumn("__eid", monotonically_increasing_id())
      .localCheckpoint()
    val vecs = withId
      .select(col("__eid"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(bs).flatMap { batch =>
          val vs = p.call(t.embed(batch.map(x => Option(x._2).getOrElse(""))))
          require(vs.length == batch.length,
            s"embedding transport returned ${vs.length} vectors for ${batch.length} inputs")
          batch.iterator.zip(vs.iterator).map { case ((id, _), v) => (id, v) }
        }
      }.toDF("__eid", outCol)
    withId.join(vecs, Seq("__eid")).drop("__eid")
  }
}
