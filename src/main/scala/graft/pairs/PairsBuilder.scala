package graft.pairs

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** DeepJoin training-pair pipeline (reference: DeepJoin/pairsBuilder.py +
  * repositoryLoader.py; SURVEY.md §3.3): assemble positive text pairs from
  * ground truth, with within-group pair generation, positional train/test
  * split and JSONL sinks.
  *
  * Ground truth shape (FIXTURES.md §B1):
  * (query_table, query_column, candidate_table, candidate_column).
  */
object PairsBuilder {

  /** P6: deduplicated (table, column) universe from both GT sides
    * (repositoryLoader.py:88–97).
    */
  def gtColumns(gt: DataFrame): DataFrame =
    gt.select(col("query_table").as("table"), col("query_column").as("column"))
      .unionByName(gt.select(col("candidate_table").as("table"),
        col("candidate_column").as("column")))
      .dropDuplicates("table", "column")

  /** J1: stats-lookup join — GT columns ⋈ profile catalog on (table,
    * column), INNER semantics (missing stats drop the row,
    * repositoryLoader.py:99–102). The catalog is metadata-sized →
    * broadcast.
    */
  def withStats(gtCols: DataFrame, profiles: DataFrame): DataFrame =
    gtCols.join(broadcast(profiles), Seq("table", "column"), "inner")

  /** J2 + F6: attach annotations (left, empty-string defaults —
    * implementing the reference's intent, repositoryLoader.py:113–132) and
    * serialize each column to its text sentence.
    *
    * `includeSamples = false` renders the sample-free variant (stats prefix
    * only): byte-deterministic across engines, so exact-comparable against
    * a SQL oracle — and it only needs the cheap stats profile, not the
    * value-sample pass.
    */
  def columnTexts(
      withStats: DataFrame,
      annotations: Option[DataFrame],
      useAnnotation: Boolean,
      includeSamples: Boolean = true): DataFrame = {
    val annotated = annotations match {
      case Some(ann) =>
        withStats.join(
          broadcast(ann.select(col("table"), col("column"),
            col("table_title"), col("semantic_annotation"))),
          Seq("table", "column"), "left")
          .withColumn("table_title", coalesce(col("table_title"), lit("")))
          .withColumn("semantic_annotation",
            coalesce(col("semantic_annotation"), lit("")))
      case None =>
        withStats.withColumn("table_title", lit(""))
          .withColumn("semantic_annotation", lit(""))
    }
    val header =
      if (useAnnotation)
        when(length(col("semantic_annotation")) > 0, col("semantic_annotation"))
          .otherwise(col("column"))
      else col("column")
    val sample =
      if (includeSamples) col("values_sample")
      else lit(null).cast("array<string>")
    annotated.withColumn("text",
      TextFns.columnToText(col("table_title"), header, col("num_values"),
        col("min_len"), col("max_len"), col("avg_len"), sample))
  }

  /** J6: GT pair assembly — each GT row joined to both sides' column texts,
    * falling back to the bare column name when metadata is missing
    * (pairsBuilder.py:93–115).
    */
  def buildPairs(gt: DataFrame, texts: DataFrame): DataFrame = {
    val t = broadcast(texts.select(col("table"), col("column"), col("text")))
    gt.join(t.toDF("query_table", "query_column", "__qt"),
        Seq("query_table", "query_column"), "left")
      .join(t.toDF("candidate_table", "candidate_column", "__ct"),
        Seq("candidate_table", "candidate_column"), "left")
      .select(
        coalesce(col("__qt"), col("query_column")).as("text_a"),
        coalesce(col("__ct"), col("candidate_column")).as("text_b"))
  }

  /** J5: within-group self-join — all unordered pairs of columns sharing a
    * group key (pairsBuilder.py:62–64, 84–92). The `a.key === b.key &&
    * a.id < b.id` inequality keeps each pair once.
    */
  def withinGroupPairs(items: DataFrame, keyCol: String, idCol: String): DataFrame =
    items.as("a")
      .join(items.as("b"),
        col(s"a.$keyCol") === col(s"b.$keyCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$keyCol").as("group_key"),
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))

  /** T5: POSITIONAL 80/20 split over a stable order, then seeded shuffle of
    * the train part (pairsBuilder.py:131–145 — the split happens before the
    * shuffle; `randomSplit` would be random membership, which is NOT the
    * reference behavior).
    *
    * The global position comes from `zipWithIndex` over the range-sorted
    * rows — a distributed pass that only collects per-partition counts to
    * size the offsets. A `row_number` over an unpartitioned window would
    * funnel every pair through one reducer; this keeps the exact
    * positional contract at any scale.
    */
  def splitPairs(pairs: DataFrame, trainRatio: Double = 0.8, seed: Int = 42)
      : (DataFrame, DataFrame) = {
    val spark = pairs.sparkSession
    val sorted = pairs.select("text_a", "text_b").sort("text_a", "text_b")
    val schema = sorted.schema
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(0), r.get(1), i)
    }
    // lazy checkpoint, not cache(): blocks release with the frame — a
    // cached copy would stay pinned in the CacheManager for the session
    // (the SemLink.knnPairs rule), one leaked pair-set per invocation
    val withIdx = spark.createDataFrame(indexed,
      schema.add("__idx", org.apache.spark.sql.types.LongType))
      .localCheckpoint(eager = false)
    val n = withIdx.count()
    val cut = math.ceil(n * trainRatio).toLong
    val train = withIdx.filter(col("__idx") < cut)
      .orderBy(rand(seed)).select("text_a", "text_b")
    val test = withIdx.filter(col("__idx") >= cut)
      .select("text_a", "text_b")
    (train, test)
  }

  /** End-to-end DeepJoin training-set build (pairsBuilder.py main flow):
    * GT → profile-stats join → column texts (annotated) → positive pairs →
    * positional 80/20 split (train side seeded-shuffled) → JSONL files
    * `train/` and `test/` under `outDir`. Returns (train, test).
    */
  def buildTrainingSet(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      gt: DataFrame,
      outDir: String,
      annotator: graft.annotate.Annotator = graft.annotate.RuleAnnotator,
      useAnnotation: Boolean = true,
      trainRatio: Double = 0.8,
      seed: Int = 42): (DataFrame, DataFrame) = {
    // cached: the catalog feeds both the stats join and the annotator
    val profiles = graft.profile.Profiler.profileLake(spark, dir).cache()
    val texts = columnTexts(
      withStats(gtColumns(gt), profiles),
      Some(annotator.annotate(profiles)), useAnnotation)
    val pairs = buildPairs(gt, texts)
    val (train, test) = splitPairs(pairs, trainRatio, seed)
    writePairsJsonl(train, s"$outDir/train")
    writePairsJsonl(test, s"$outDir/test")
    profiles.unpersist() // terminal writes done — release the cached catalog
    (train, test)
  }

  /** S8: JSONL pairs sink — one JSON array per line
    * (pairsBuilder.py:120–129: `["<query text>", "<candidate text>"]`).
    */
  def writePairsJsonl(pairs: DataFrame, path: String): Unit =
    pairs.select(to_json(array(col("text_a"), col("text_b"))).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** S6: JSONL pairs source (search_query.py:19–34). */
  def readPairsJsonl(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)).as("p"))
      .select(col("p").getItem(0).as("text_a"), col("p").getItem(1).as("text_b"))
      .na.drop(Seq("text_a", "text_b"))
}
