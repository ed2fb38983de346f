package graft.annotate

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.profile.Sampling

/** LLM annotation-prompt preparation — the reference's generate_prompt
  * stage (SemanticAnnotation/semantic_annotation.py:55–114): row dedup
  * (P4) BEFORE the expensive sampling, seeded 10-row sample (T4), null
  * fill with empty strings (P5), markdown table render (F15).
  *
  * The markdown render runs on the driver over the collected sample — the
  * sample is prompt-sized by construction (`numRows` ≤ ~10), never data-
  * sized. Everything upstream of the collect is distributed.
  */
object LlmPrompt {

  /** P4 + T4 + P5: deduped, seeded, null-filled sample frame. */
  def prepareSample(df: DataFrame, numRows: Int = 10, seed: Int = 42): DataFrame = {
    val allString = df.select(df.columns.map(c => col(c).cast("string").as(c)): _*)
    Sampling.seededSample(allString.dropDuplicates(), numRows, seed).na.fill("")
  }

  /** F15: markdown table of the (collected) sample rows. */
  def markdownTable(header: Seq[String], rows: Seq[Row]): String = {
    def fmt(cells: Seq[String]) = cells.mkString("| ", " | ", " |")
    val head = fmt(header)
    val sep = fmt(header.map(_ => "---"))
    val body = rows.map(r =>
      fmt(header.indices.map(i => Option(r.get(i)).map(_.toString).getOrElse(""))))
    (head +: sep +: body).mkString("\n")
  }

  /** Catalog-shaped annotation prompt: rendered from profile metadata
    * (column, inferred type, sample values) instead of raw table rows —
    * the executor-side prompt for [[LlmAnnotator]], which only sees the
    * profile catalog. Pure string function, safe inside mapPartitions.
    */
  def catalogPrompt(table: String, columns: Seq[String], types: Seq[String],
      samples: Seq[Seq[String]] = Nil): String = {
    def fmt(cells: Seq[String]) = cells.mkString("| ", " | ", " |")
    val header = Seq("column", "type", "sample_values")
    val body = columns.indices.map { i =>
      val s = samples.lift(i).flatMap(Option(_))
        .map(_.take(5).mkString(", ")).getOrElse("")
      fmt(Seq(columns(i), types.lift(i).getOrElse(""), s))
    }
    (Seq(
      s"Table name: $table",
      "Columns:",
      fmt(header),
      fmt(header.map(_ => "---"))) ++ body ++ Seq(
      "Assign a meaningful snake_case semantic annotation to every column,",
      "a table_title and a table_description. Respond with a JSON object",
      "with keys table_name, table_description, table_title, columns."))
      .mkString("\n")
  }

  /** Full per-table annotation prompt (system prompt + sample table) —
    * the string handed to an [[Annotator]]'s LLM backend.
    */
  def tablePrompt(df: DataFrame, tableName: String, numRows: Int = 10,
      seed: Int = 42): String = {
    val sample = prepareSample(df, numRows, seed)
    val md = markdownTable(df.columns.toSeq, sample.collect().toSeq)
    // NB no stripMargin here — it would strip the markdown's leading pipes
    Seq(
      s"Table name: $tableName",
      "Sample rows:",
      md,
      "Assign a meaningful snake_case semantic annotation to every column,",
      "a table_title and a table_description. Respond with a JSON object",
      "with keys table_name, table_description, table_title, columns.")
      .mkString("\n")
  }
}
