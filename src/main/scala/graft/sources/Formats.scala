package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-format sources and sinks beyond parquet (SURVEY.md §2.1).
  * The reference reads CSV/TSV lakes and JSON metadata files; our engine
  * keeps those ingestion paths while using parquet for internal datasets.
  */
object Formats {

  /** S1: CSV table scan with header + schema inference; unreadable files
    * tolerated (extract_schema.py:33–38 skips them).
    */
  def csvScan(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("mode", "DROPMALFORMED")
      .csv(path)

  /** S2: CSV/TSV all-string scan (`dtype="string"`,
    * semantic_annotation.py:17–36; `\t` separator for `.tsv`).
    */
  def csvScanAllString(spark: SparkSession, path: String): DataFrame = {
    val sep = if (path.endsWith(".tsv")) "\t" else ","
    // a header read WITHOUT inferSchema already types every column
    // StringType — no second header-parse pass to rebuild what Spark's
    // default gives
    spark.read.option("header", "true").option("sep", sep).csv(path)
  }

  /** S3: folder glob scan preserving table-per-file identity — the profile
    * grain is per file (extract_schema.py:88–99).
    */
  def csvFolderScan(spark: SparkSession, dir: String): DataFrame =
    csvScan(spark, dir).withColumn("__table",
      regexp_extract(input_file_name(), "([^/]+)\\.csv$", 1))

  /** S5: JSON metadata source (multiline documents with explicit schema —
    * data_loader.py:156–158 reads whole-file JSON arrays).
    */
  def jsonScan(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("multiLine", "true").schema(schema).json(path)

  /** S6: JSONL source (Spark's native JSON format). */
  def jsonlScan(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S7/S8: JSON(L) sink; coalesce(1) mirrors the reference's single-file
    * outputs for metadata-sized frames only.
    */
  def jsonSink(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).json(path)

  /** S9: CSV sink with header (df.to_csv equivalents,
    * join_discoverer.py:491–517).
    */
  def csvSink(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S10: parquet checkpoint memoization — recompute-or-load, replacing the
    * reference's file-level JSON caches (join_discoverer.py:189–197,
    * semlink.py:12–16). Existence check on the _SUCCESS marker.
    */
  def checkpoint(spark: SparkSession, path: String)(compute: => DataFrame): DataFrame = {
    // resolve the filesystem FROM the path — FileSystem.get(conf) returns
    // the default FS, which is wrong for e.g. an s3a:// checkpoint when
    // the default is file:// (Wrong-FS error or a miss on the marker)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
    if (fs.exists(marker)) spark.read.parquet(path)
    else {
      compute.write.mode(SaveMode.Overwrite).parquet(path)
      spark.read.parquet(path)
    }
  }
}
