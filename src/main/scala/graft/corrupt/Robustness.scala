package graft.corrupt

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.annotate.{Canonicalize, RuleAnnotator}

/** End-to-end corruption-robustness experiment: apply each schema-noise
  * regime to the lake's column names, push BOTH the clean and corrupted
  * names through the annotate → canonicalize pipeline, and measure per
  * regime how many annotations survive (the reference's robustness run:
  * corruption.py regimes applied at semantic_annotation.py:173–187 before
  * annotation).
  *
  * The corruption itself is schema-level (column-name metadata, a few
  * dozen strings) and runs through the [[Corruption]] DataFrame renames;
  * everything downstream — normalization, synonym canonicalization and the
  * survival aggregation — is the regular distributed pipeline, so the
  * experiment scales with catalog width, not data volume.
  */
object Robustness {

  /** (table, cleanName, regime, corruptedName) for the three regimes,
    * obtained by zipping each regime-renamed DataFrame's schema against
    * the clean one. `p` gates regime 2 only: the reference's corrupt_3
    * substitutes EVERY column name unconditionally (corruption.py:35,
    * a bare random.choice with no probability gate), so regime 3 runs at
    * p = 1.0 regardless.
    */
  def corruptedCatalog(
      tables: Seq[(String, DataFrame)],
      p: Double = 0.65,
      seed: Int = 42): Seq[(String, String, Int, String)] = {
    val pool = tables.flatMap(_._2.columns)
    tables.flatMap { case (tbl, df) =>
      val clean = df.columns
      val r1 = Corruption.positionalRename(df).columns
      val r2 = Corruption.charNoiseRename(df, p, seed).columns
      val r3 = Corruption.poolSubstitution(df, pool, 1.0, seed).columns
      clean.indices.flatMap(i => Seq(
        (tbl, clean(i), 1, r1(i)),
        (tbl, clean(i), 2, r2(i)),
        (tbl, clean(i), 3, r3(i))))
    }
  }

  /** Per-regime annotation-survival metrics:
    * (regime, n_cols, n_match, match_rate). The canonical synonym mapping
    * is folded over the CLEAN vocabulary in deterministic (table, column)
    * order — the production first-seen fold — and then applied to both the
    * clean and the corrupted annotation of every column; a column
    * "survives" a regime when both canonicalize to the same term.
    */
  def annotationSurvival(
      spark: SparkSession,
      tables: Seq[(String, DataFrame)],
      p: Double = 0.65,
      seed: Int = 42): DataFrame = {
    import spark.implicits._
    val cat = corruptedCatalog(tables, p, seed)
      .toDF("table", "column", "regime", "corrupted")
    val annotated = cat.select(
      col("table"), col("column"), col("regime").cast("long").as("regime"),
      RuleAnnotator.semanticName(col("column")).as("clean_anno"),
      RuleAnnotator.semanticName(col("corrupted")).as("corrupt_anno"))

    val (_, mapping) = Canonicalize.canonicalizeAnnotations(
      annotated.filter(col("regime") === 1) // one row per catalog column
        .select(col("table"), col("column"),
          col("clean_anno").as("semantic_annotation")))
    val mapExpr = map(
      mapping.toSeq.sorted.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

    annotated.select(col("regime"),
        coalesce(element_at(mapExpr, col("clean_anno")), col("clean_anno"))
          .as("clean_canon"),
        coalesce(element_at(mapExpr, col("corrupt_anno")), col("corrupt_anno"))
          .as("corrupt_canon"))
      .groupBy("regime")
      .agg(count(lit(1)).as("n_cols"),
        sum(when(col("clean_canon") === col("corrupt_canon"), 1L).otherwise(0L))
          .as("n_match"))
      .select(col("regime"), col("n_cols"), col("n_match"),
        round(col("n_match").cast("double") / col("n_cols"), 4).as("match_rate"))
  }
}
