package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-lake catalog: one parquet file per table (the driver testdata plays
  * the role of the reference's CSV lake — reference folder-glob scan at
  * SchemaExtraction/extract_schema.py:88–99). Table-per-file grain is kept
  * because the profile grain is per file.
  */
object Lake {

  /** The ten driver testdata tables (TESTDATA.md / FIXTURES.md §A). */
  val allTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The relational star-schema slice (profiled as the "lake"; the three
    * added-scope tables are consumed by their dedicated operators).
    */
  val lakeTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  // Memoize resolved table plans per (session, dir, table): footer reads +
  // file listing cost ~hundreds of ms on the driver, and catalog-wide
  // operators re-touch the same immutable tables many times per session.
  // Weak session keys: a stopped, dereferenced session GCs together with
  // its cached plans (an identity-hash key could collide with a later
  // session and would pin dead sessions forever). The VALUE is held via a
  // SoftReference: a strongly-held map would pin its own key forever
  // (DataFrame → session → key — the classic WeakHashMap value chain),
  // so no dead session could ever be collected. Soft values keep the
  // memoization alive under normal operation (cleared only under memory
  // pressure, unlike weak ones that every minor GC flushes) and the cost
  // of a cleared entry is one footer re-read. (events is only ever
  // loaded via [[events]], which sets nanosAsLong before the first — and
  // therefore the cached — resolution.)
  private type TableMap =
    java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]
  private val tableCache =
    new java.util.WeakHashMap[SparkSession, java.lang.ref.SoftReference[TableMap]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = tableCache.synchronized {
      val live = Option(tableCache.get(spark)).flatMap(r => Option(r.get()))
      live.getOrElse {
        val m = new TableMap()
        tableCache.put(spark, new java.lang.ref.SoftReference(m))
        m
      }
    }
    perSession.computeIfAbsent((dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Test hooks: the live per-session map (if the soft value survives) and
    * its reference (so specs can simulate a memory-pressure clear).
    */
  private[graft] def cachedMap(spark: SparkSession): Option[TableMap] =
    tableCache.synchronized(
      Option(tableCache.get(spark)).flatMap(r => Option(r.get())))
  private[graft] def cachedRef(
      spark: SparkSession): Option[java.lang.ref.SoftReference[TableMap]] =
    tableCache.synchronized(Option(tableCache.get(spark)))

  /** Load several tables concurrently. Plan construction reads parquet
    * footers on the DRIVER (~hundreds of ms per table including file
    * listing); done serially that dominates catalog-wide metadata
    * operations, so fan the footer reads out.
    */
  def tables(spark: SparkSession, dir: String,
      names: Seq[String]): Seq[(String, DataFrame)] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(
      Future.traverse(names)(n => Future(n -> table(spark, dir, n))),
      5.minutes)
  }

  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and floor
    * to a microsecond TimestampType column (integer `div` — a double
    * division would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    // layout-adaptive: a TIMESTAMP(NANOS) file resolves (under the flag
    // above) to a LONG ts that must be truncated to micros; a
    // TIMESTAMP(MICROS) file resolves to a native timestamp (NTZ when
    // the writer did not adjust to UTC) that only needs the session-tz
    // cast. Both layouts exist across driver testdata generations.
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
  }
}
