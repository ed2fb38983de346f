package graft.profile

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Lake

/** Column profiling — the reference's core aggregation
  * (SchemaExtraction/extract_schema.py:40–77), re-expressed as a single
  * melt + two hash aggregations so it scales to arbitrarily wide tables and
  * arbitrarily many rows (the reference is per-column pandas loops).
  *
  * Output grain: one row per (table, column) with
  *   inferred_type ∈ {integer, float, datetime, string}
  *     (extract_schema.py:11–20 dtype mapping),
  *   row_count, num_values (non-null count), nulls,
  *   min_len / max_len / avg_len of the string-cast values
  *     (stats on astype(str), extract_schema.py:49–72; avg rounded to 2),
  *   values_sample: first `sampleSize` distinct values in first-seen order
  *     (pandas unique() order, extract_schema.py:33, 74–77),
  *   most_common_values: top `topK` by frequency — consumed by the embedding
  *     prompt (join_discoverer.py:117–119) but never produced by the
  *     reference profiler; we produce it properly (SURVEY.md §1.4).
  */
object Profiler {

  /** Reference dtype → four-type system (extract_schema.py:11–20). */
  def inferType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "integer"
    case FloatType | DoubleType | _: DecimalType       => "float"
    case TimestampType | TimestampNTZType | DateType   => "datetime"
    case _                                             => "string"
  }

  /** Long-form melt: one row per (column, value, rid). One narrow pass —
    * no shuffle until the downstream aggregations.
    */
  private def melt(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    df.withColumn("__rid", monotonically_increasing_id())
      .select(
        col("__rid"),
        explode(array(fields.map(f =>
          struct(lit(f.name).as("column"), qcol(f.name).cast("string").as("value"))): _*)).as("kv"))
      .select(col("__rid"), col("kv.column").as("column"), col("kv.value").as("value"))
  }

  /** Backtick-quoted column reference: `col(name)` PARSES its argument
    * (dots = struct-field access), so a legal parquet column named
    * "user.id" would fail resolution in every data-derived reference —
    * quote anything whose name comes from a schema, not from our code.
    */
  private def qcol(name: String) = col("`" + name.replace("`", "``") + "`")

  /** Scalar per-column stats in ONE aggregation pass — no melt, no
    * wide shuffle. Partial (map-side) aggregation reduces each partition to
    * 4·|columns|+1 values, so the shuffle is O(columns), not O(rows): at
    * 100 TB this is the difference between shuffling 11× the table and
    * shuffling a few KB. The single stats row is then exploded back to the
    * one-row-per-column catalog grain.
    */
  def profileStats(df: DataFrame, tableName: String): DataFrame = {
    val fields = df.schema.fields
    val aggs = count(lit(1)).as("__rc") +: fields.toSeq.flatMap { f =>
      val v = length(qcol(f.name).cast("string"))
      Seq(
        count(qcol(f.name)).as(s"__nv_${f.name}"),
        min(v).as(s"__mn_${f.name}"),
        max(v).as(s"__mx_${f.name}"),
        avg(v).as(s"__av_${f.name}"))
    }
    val entries = fields.map { f =>
      struct(
        lit(f.name).as("column"),
        lit(inferType(f.dataType)).as("inferred_type"),
        qcol(s"__nv_${f.name}").as("num_values"),
        qcol(s"__mn_${f.name}").cast(LongType).as("min_len"),
        qcol(s"__mx_${f.name}").cast(LongType).as("max_len"),
        round(qcol(s"__av_${f.name}"), 2).as("avg_len"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__rc").as("row_count"), explode(array(entries: _*)).as("e"))
      .select(
        lit(tableName).as("table"),
        col("e.column").as("column"),
        col("e.inferred_type"),
        col("row_count"),
        col("e.num_values"),
        (col("row_count") - col("e.num_values")).as("nulls"),
        col("e.min_len"), col("e.max_len"), col("e.avg_len"))
  }

  /** Full profile including values_sample (first-seen distinct order) and
    * most_common_values (top-K by frequency, ties broken by value asc).
    *
    * Both samples come from ONE partial-top-k aggregation pass over the
    * distinct-value counts ([[graft.functions.AggExpressions.boundedTopK]]):
    * each task keeps a k-sized buffer per column and the final merge sees
    * only |partitions| × |columns| such buffers. A ranking window here
    * (`Window.partitionBy("column")`) would route every distinct value of a
    * column through a single reducer — O(N) rows in one task for a
    * near-unique column, the profiler's scale-killer at 100 TB.
    */
  def profileTable(
      df: DataFrame,
      tableName: String,
      sampleSize: Int = 30,
      topK: Int = 20): DataFrame = {
    import graft.functions.AggExpressions.boundedTopK
    val stats = profileStats(df, tableName)

    val valueCounts = melt(df)
      .filter(col("value").isNotNull)
      .groupBy("column", "value")
      .agg(count(lit(1)).as("cnt"), min("__rid").as("first_rid"))

    // first-seen order = (first_rid ASC, value ASC); top-by-frequency =
    // (cnt DESC, value ASC) ≡ (-cnt ASC, value ASC)
    val samples = valueCounts
      .groupBy("column")
      .agg(
        boundedTopK(col("first_rid"), col("value"), sampleSize)
          .as("values_sample"),
        boundedTopK(-col("cnt"), col("value"), topK)
          .as("most_common_values"))

    stats
      .join(samples, Seq("column"), "left")
      .select("table", "column", "inferred_type", "row_count", "num_values",
        "nulls", "min_len", "max_len", "avg_len", "values_sample",
        "most_common_values")
  }

  /** A4: head-rows sample as records (`sample_rows` in the reference's
    * table summary, extract_schema.py:45 — first `n` rows as string maps).
    */
  def sampleRows(df: DataFrame, n: Int = 3): Seq[Map[String, String]] = {
    val cols = df.columns
    df.limit(n).collect().map { r =>
      cols.zipWithIndex.map { case (c, i) =>
        c -> Option(r.get(i)).map(_.toString).orNull
      }.toMap
    }.toSeq
  }

  /** Profile every table of the lake (stats only — cheap, oracle-friendly).
    * Tables load concurrently ([[Lake.tables]]) — the serial footer reads
    * otherwise dominate the catalog pass.
    */
  def profileLakeStats(spark: SparkSession, dir: String,
      tables: Seq[String] = Lake.lakeTables): DataFrame =
    Lake.tables(spark, dir, tables)
      .map { case (t, df) => profileStats(df, t) }
      .reduce(_.unionByName(_))

  /** Profile every table of the lake with samples (the SemLink input). */
  def profileLake(spark: SparkSession, dir: String,
      tables: Seq[String] = Lake.lakeTables,
      sampleSize: Int = 30, topK: Int = 20): DataFrame =
    Lake.tables(spark, dir, tables)
      .map { case (t, df) => profileTable(df, t, sampleSize, topK) }
      .reduce(_.unionByName(_))
}
