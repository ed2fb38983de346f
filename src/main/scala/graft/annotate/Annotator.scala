package graft.annotate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Semantic annotation — the reference's SemanticAnnotation module
  * (semantic_annotation.py:55–131: LLM assigns a meaningful snake_case
  * name per column plus a table title/description).
  *
  * The LLM call is external and nondeterministic, so the engine isolates
  * it behind this trait (SURVEY.md §2.10). [[RuleAnnotator]] is the
  * deterministic default every test and oracle runs; an LLM-backed
  * implementation would batch HTTP calls per partition via `mapPartitions`
  * (mirroring the reference's throttled loop, join_discoverer.py:244)
  * behind the same surface.
  */
trait Annotator extends Serializable {

  /** Input: the column-profile catalog (one row per (table, column)).
    * Output: Annotation grain — (table, table_title, table_description,
    * column, semantic_annotation).
    */
  def annotate(profiles: DataFrame): DataFrame
}

/** Deterministic rule-based annotator: semantic name = snake-normalized
  * column with the TPC-H-style single-letter table prefix stripped
  * (`c_custkey` → `custkey`), title = table name, description derived from
  * the profile. Pure column expressions — whole-stage codegen, no UDF.
  */
object RuleAnnotator extends Annotator {

  def semanticName(column: Column): Column =
    regexp_replace(TextFns.snakeNormalize(column), "^[a-z]_", "")

  override def annotate(profiles: DataFrame): DataFrame =
    profiles.select(
      col("table"),
      col("table").as("table_title"),
      format_string("Table %s", col("table")).as("table_description"),
      col("column"),
      semanticName(col("column")).as("semantic_annotation"))
}
