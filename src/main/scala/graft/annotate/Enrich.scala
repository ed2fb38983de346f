package graft.annotate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dates.DateNorm

/** Semantics-enrichment join (J3 — reference: data_loader.py:180–206):
  * column profiles × annotations on (table, column), left semantics with
  * empty-string defaults for missing annotations (the reference's intent;
  * its own lookup-miss path has an unbound-variable bug,
  * repositoryLoader.py:113–132), plus the conditional `date` type override
  * when the annotation contains "date" (data_loader.py:197–205) — in which
  * case the values sample is re-rendered through the date normalizer.
  */
object Enrich {

  def enrichProfiles(profiles: DataFrame, annotations: DataFrame): DataFrame = {
    val ann = broadcast(annotations.select(
      col("table"), col("column"),
      col("table_title"), col("table_description"),
      col("semantic_annotation")))
    val joined = profiles.join(ann, Seq("table", "column"), "left")
      .withColumn("table_title", coalesce(col("table_title"), lit("")))
      .withColumn("table_description", coalesce(col("table_description"), lit("")))
      .withColumn("semantic_annotation", coalesce(col("semantic_annotation"), lit("")))
    val isDate = lower(col("semantic_annotation")).contains("date")
    val typed = joined.withColumn("enriched_type",
      when(isDate, lit("date")).otherwise(col("inferred_type")))
    if (typed.columns.contains("values_sample"))
      typed.withColumn("values_sample",
        when(isDate && col("values_sample").isNotNull,
          transform(col("values_sample"),
            v => coalesce(DateNorm.normalizeDate(v), v)))
          .otherwise(col("values_sample")))
    else typed
  }
}
