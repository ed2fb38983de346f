package graft.annotate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{CompletionTransport, LlmPolicy}

/** LLM-backed [[Annotator]] (reference flow:
  * SemanticAnnotation/semantic_annotation.py:116–131): ONE completion call
  * per table over a catalog prompt, executed inside `mapPartitions` so a
  * partition's tables share one transport instance and run sequentially
  * under the reference's throttle + retry-once policy
  * (semantic_annotation.py:198–205; join_discoverer.py:244).
  *
  * Responses go through the same [[LlmJson]] extraction/validation used
  * everywhere; a table whose call fails or whose JSON is invalid falls
  * back to the deterministic [[RuleAnnotator]] naming, so the pipeline
  * never stalls on a flaky backend.
  *
  * The LLM volume is catalog-sized (one call per TABLE), never data-sized.
  */
final case class LlmAnnotator(
    transport: CompletionTransport,
    policy: LlmPolicy = LlmPolicy()) extends Annotator {

  override def annotate(profiles: DataFrame): DataFrame = {
    val spark = profiles.sparkSession
    import spark.implicits._

    val sampleCol =
      if (profiles.columns.contains("values_sample")) col("values_sample")
      else lit(null).cast("array<string>")

    val perTable = profiles
      .select(col("table"), col("column"), col("inferred_type"),
        sampleCol.as("vs"))
      .groupBy("table")
      .agg(collect_list(struct(col("column"), col("inferred_type"), col("vs")))
        .as("cols"))
      .select(col("table"),
        col("cols.column").as("columns"),
        col("cols.inferred_type").as("types"),
        col("cols.vs").as("samples"))
      .as[(String, Seq[String], Seq[String], Seq[Seq[String]])]

    val t = transport
    val p = policy
    val raw = perTable.mapPartitions { it =>
      it.map { case (table, columns, types, samples) =>
        val prompt = LlmPrompt.catalogPrompt(table, columns, types, samples)
        val resp =
          try p.call(t.complete(prompt))
          catch { case _: Exception => null } // both attempts failed → fallback row
        (table, columns, resp)
      }
    }.toDF("table", "columns", "response")
      // cache: downstream sorts/reuse must NOT re-fire the external calls
      // (a range-partition sampling job alone would double them); the
      // frame is one row per table — catalog-sized, never data-sized
      .cache()

    val parsed = raw
      .withColumn("ann", LlmJson.extractCleanJson(col("response")))
      .withColumn("valid",
        col("ann").isNotNull &&
          LlmJson.validColumnCount(col("ann"), size(col("columns"))))

    parsed
      .select(
        col("table"),
        when(col("valid"), col("ann.table_title")).as("__tt"),
        when(col("valid"), col("ann.table_description")).as("__td"),
        when(col("valid"), col("ann.columns")).as("__cmap"),
        explode(col("columns")).as("column"))
      .select(
        col("table"),
        coalesce(col("__tt"), col("table")).as("table_title"),
        coalesce(col("__td"), format_string("Table %s", col("table")))
          .as("table_description"),
        col("column"),
        coalesce(element_at(col("__cmap"), col("column")),
          RuleAnnotator.semanticName(col("column"))).as("semantic_annotation"))
  }
}
