package graft.text

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** Persistent BM25 inverted index — the incremental-corpus counterpart of
  * the one-shot [[Bm25.scoreTopK]] (which re-derives the whole index per
  * run; serving lexical retrieval over a 100 TB corpus must not).
  * Index-as-data layout in the [[graft.knn.IvfIndex]] /
  * [[graft.dedup.LshDedupIndex]] family (reference analogue: none — the
  * reference keeps no corpus state at all, SURVEY.md §7.4):
  *
  *  - `postings/` — (id, th, term, tf) parquet PARTITIONED BY `bucket` =
  *    pmod(xxhash64(term), nBuckets): the inverted index. ALL postings of
  *    a term live in that term's bucket, so a probe reads only the
  *    buckets its query terms hash to (directory-pruned at file-listing
  *    level) and per-term document frequencies counted inside a pruned
  *    read are complete;
  *  - `doclens/` — (id, th, dl): one row per token-bearing document.
  *    Doubles as the corpus-statistics source: N and avgdl are a 1-row
  *    aggregation over this narrow table at probe time, so they are
  *    always consistent with the committed corpus — no separately
  *    maintained stats row to drift;
  *  - `params/` — one row (n_buckets): the partitioning scheme. Probe
  *    and append read it from the index — a caller cannot mismatch the
  *    build.
  *
  * `th` is the EPOCH stamp: xxhash64 of the document's raw text, carried
  * on every postings row and on the doclens row. The probe joins
  * postings to doclens on (id, th), so a posting is visible ONLY when
  * the exact text version it was derived from is committed.
  *
  * Write ORDER is the append crash-safety protocol (the LshDedupIndex
  * convention): postings stage FIRST, the doclens write is the commit
  * point. A document is "in the index" iff its doclens row exists. The
  * (id, th) join then makes every crash shape harmless:
  *  - crash between the writes → orphaned postings, no doclens row:
  *    invisible to probes; reclaimed by [[vacuum]];
  *  - retry of the crashed append (same text, same th) → postings staged
  *    twice: collapsed at probe time (max over identical rows) and
  *    reclaimed by [[vacuum]];
  *  - id REUSED after a crashed append with DIFFERENT text (corrected
  *    content, no vacuum in between) → the old epoch's postings carry a
  *    th no doclens row ever commits: permanently invisible, and
  *    [[vacuum]] reclaims them even though the id itself is now live.
  * One probe-visible transient remains: per-term df counts from a pruned
  * read include orphaned postings until [[vacuum]] — a bounded score
  * perturbation (df over-count ≤ the crashed batches), never a phantom
  * result row.
  */
object Bm25Index {

  /** On-disk postings schema (explicit on every read: an EMPTY index —
    * e.g. freshly built over zero documents, the streaming-ingest seed —
    * writes no part files under the partitioned `postings/`, and a
    * schema-less read of it would throw instead of returning no rows).
    */
  private val postingsSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("th", LongType),
    StructField("term", StringType),
    StructField("tf", LongType),
    StructField("bucket", LongType)))

  private val doclensSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("th", LongType),
    StructField("dl", LongType)))

  /** The output schema of [[searchTopK]] — the empty-probe constant, the
    * [[graft.knn.IvfIndex.searchSchema]] convention.
    */
  val searchSchema: StructType = StructType(Seq(
    StructField("query_id", LongType),
    StructField("id", LongType),
    StructField("score", DoubleType),
    StructField("rnk", IntegerType, nullable = false)))

  /** Build the index layout under `dir`. Returns the indexed (token-
    * bearing) document count. Rebuild-in-place overwrites all tables.
    */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      nBuckets: Int = 32): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(nBuckets > 0, s"Bm25Index: nBuckets must be positive, got $nBuckets")
    // same single-writer lock as append/vacuum: a build racing a live
    // append would Overwrite tables the append is mid-commit on, silently
    // losing the append's rows
    graft.util.IndexLock.withLock(spark, dir, "Bm25Index.build") {
      recoverCommit(spark, dir)
      // all three tables are STAGED and committed by one marker-protected
      // swap: sequenced live Overwrites could crash between the params
      // write and the data writes, leaving a NEW bucket count over OLD
      // postings — probes would then prune to buckets the persisted
      // rows were never hashed into, silently missing terms
      Seq(Tuple1(nBuckets)).toDF("n_buckets")
        .repartition(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/params.tmp")
      val n = writeState(docs, idCol, textCol, dir, nBuckets,
        SaveMode.Overwrite, tableSuffix = ".tmp")
      val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
      graft.util.StagedTables.commit(fs, dir, BuildMarker, CommitTables,
        "Bm25Index.build") {
        // fresh corpus → fresh ingest state, inside the marker window so
        // a crash here replays the clear on recovery and a crash BEFORE
        // the marker rolls back to the previous index with its watermark
        graft.util.IngestState.clear(spark, dir)
      }
      n
    }
  }

  /** The per-document token frame of a batch: (id, th, tfs) with `tfs`
    * an array<struct<term, tf>> computed PER ROW ([[Bm25.termFreqs]] —
    * term frequency is document-local, so no tokenize shuffle exists at
    * any corpus size). The ONE text scan whose output feeds every
    * index-state consumer: the postings write ([[tfFromRows]] explode),
    * the doclens write ([[dlFromRows]] array sum — no shuffle either),
    * and (via [[searchTopK]]'s `preQTerms`) the probe's query-term set.
    * A streaming micro-batch computes this once, lazy-localCheckpoint-ed,
    * and both its search and its append reuse it.
    */
  private[graft] def tokenRows(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        xxhash64(coalesce(col(textCol), lit(""))).as("th"),
        Bm25.termFreqs(col(textCol)).as("tfs"))

  /** (id, th, term, tf) — the inverted-index rows of a [[tokenRows]]
    * frame.
    */
  private[graft] def tfFromRows(rows: DataFrame): DataFrame =
    rows.select(col("id"), col("th"), explode(col("tfs")).as("r"))
      .select(col("id"), col("th"), col("r.term").as("term"),
        col("r.tf").as("tf"))

  /** (id, th, dl) document lengths of a [[tokenRows]] frame — blank
    * documents (dl 0) index nothing, exactly the explode-side filter.
    */
  private[graft] def dlFromRows(rows: DataFrame): DataFrame =
    rows.select(col("id"), col("th"),
        aggregate(col("tfs"), lit(0L), (a, x) => a + x.getField("tf")).as("dl"))
      .filter(col("dl") > 0)

  /** Tokenize + write shared by [[build]] and [[append]]: ONE per-row
    * tokenize pass over the batch (lazy-localCheckpoint-ed — it feeds
    * the postings write, the doclens write, and the returned count),
    * then the two writes in commit order.
    */
  private def writeState(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      nBuckets: Int,
      mode: SaveMode,
      tableSuffix: String = ""): Long = {
    val rows = tokenRows(docs, idCol, textCol).localCheckpoint(eager = false)
    writeTf(tfFromRows(rows), dlFromRows(rows), dir, nBuckets, mode,
      needCount = true, tableSuffix = tableSuffix)
  }

  /** The write half of [[writeState]], callable with caller-shared
    * `tf`/`dl` frames (from ONE [[tokenRows]] pass, ideally lazy-
    * localCheckpoint-ed). Write order is the crash-safety protocol
    * (postings stage first, the doclens write is the commit point).
    * `needCount = false` skips the final count job for callers that
    * ignore the return value (the streaming ingesters — one fewer
    * scheduler round-trip per batch) and returns -1.
    */
  private[graft] def writeTf(
      tf: DataFrame,
      dl: DataFrame,
      dir: String,
      nBuckets: Int,
      mode: SaveMode,
      needCount: Boolean,
      repartitionByBucket: Boolean = true,
      tableSuffix: String = ""): Long = {
    val bucketed = tf.withColumn("bucket",
      pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
    // repartitionByBucket = false (the per-MICRO-BATCH append path):
    // coalesce to ONE task instead of paying the clustering exchange —
    // partitionBy from the freshness join's many cached partitions
    // would fan each task into every bucket it touches (sliver-file
    // explosion; see LshDedupIndex.writeSigned). One task × ≤buckets
    // files, narrow. Micro-batches are single-staged-file sized by
    // contract; full builds keep the exchange.
    (if (repartitionByBucket) bucketed.repartition(col("bucket"))
     else bucketed.coalesce(1))
      .write.mode(mode)
      .partitionBy("bucket")
      .parquet(s"$dir/postings$tableSuffix")
    // commit point (see the write-order doc above); a staging build
    // (`tableSuffix = ".tmp"`) commits via the marker swap instead. The
    // micro-batch path coalesces for the same sliver-file reason
    (if (repartitionByBucket) dl else dl.coalesce(1))
      .write.mode(mode).parquet(s"$dir/doclens$tableSuffix")
    if (needCount) dl.count() else -1L
  }

  /** The index's bucket count. Package-private so a per-batch caller can
    * load params ONCE and hand them to both [[searchTopK]] (`preNBuckets`)
    * and [[writeTf]], instead of paying the params collect twice per
    * micro-batch.
    */
  private[graft] def loadParams(spark: SparkSession, dir: String): Int = {
    val rows = spark.read.parquet(s"$dir/params").select("n_buckets").collect()
    require(rows.length == 1, s"Bm25Index: malformed params under $dir")
    rows.head.getInt(0)
  }

  /** Commit-generation fingerprint of `params/` — the revalidation key
    * for an ingest loop's per-loop params memo (see
    * [[graft.knn.IvfIndex.metaGen]] for the failure this prevents: a
    * rebuild committing between batches swaps the table the memo
    * caches). Filesystem metadata only, no Spark jobs.
    */
  private[graft] def metaGen(spark: SparkSession, dir: String): Long =
    graft.util.StagedTables.metaFingerprint(
      new Path(dir).getFileSystem(spark.sessionState.newHadoopConf()),
      dir, Seq("params"))

  private def readPostings(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(postingsSchema).parquet(s"$dir/postings")

  /** The committed-membership table: (id, th, dl). Exposed
    * (package-private) so per-batch callers — the streaming ingester's
    * freshness anti-join — can read it ONCE, lazy-localCheckpoint it, and
    * hand the same frame to [[searchTopK]]'s `preDoclens` hook instead of
    * re-scanning the corpus table per consumer.
    */
  private[graft] def readDoclens(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(doclensSchema).parquet(s"$dir/doclens")

  /** Add a new batch WITHOUT touching existing state: one tokenize pass,
    * parquet-appended into the bucket partitions and `doclens/`. Ids must
    * be unique corpus-wide. Blank documents index nothing (the
    * [[Bm25.scoreTopK]] convention — they can never match a term) and do
    * not count toward the returned appended-row count.
    *
    * `checkPresence = false` skips the already-present doclens join for
    * callers that have JUST established disjointness themselves (the
    * streaming ingester's per-batch anti-join) — one fewer corpus-table
    * scan per batch. `checkBatchUnique = false` likewise skips the
    * within-batch duplicate-id aggregation (one fewer job) for callers
    * whose input contract already guarantees unique ids per batch.
    * `takeLock = false` is for callers ALREADY holding the directory's
    * writer lock (the watermarked ingest gate locks the whole
    * micro-batch); the lock is not reentrant, so a nested acquire would
    * fail fast against the caller's own hold.
    */
  def append(
      spark: SparkSession,
      dir: String,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      checkPresence: Boolean = true,
      checkBatchUnique: Boolean = true,
      takeLock: Boolean = true): Long =
    if (!takeLock)
      appendImpl(spark, dir, newDocs, idCol, textCol, checkPresence,
        checkBatchUnique)
    else
      graft.util.IndexLock.withLock(spark, dir, "Bm25Index.append") {
        appendImpl(spark, dir, newDocs, idCol, textCol, checkPresence,
          checkBatchUnique)
      }

  /** Streaming-batch append over a caller-shared [[tokenRows]] frame
    * and preloaded bucket count: the per-batch fast path — no
    * re-tokenize, no params read, no count job, no clustering exchange.
    * The caller owns the guards [[append]]'s flags would run (absence
    * via its anti-join, within-batch uniqueness by input contract).
    * `takeLock = false` for callers already holding the writer lock.
    */
  private[graft] def appendRows(
      spark: SparkSession,
      dir: String,
      rows: DataFrame,
      nBuckets: Int,
      takeLock: Boolean): Unit =
    if (!takeLock) {
      writeTf(tfFromRows(rows), dlFromRows(rows), dir, nBuckets,
        SaveMode.Append, needCount = false, repartitionByBucket = false); ()
    } else
      graft.util.IndexLock.withLock(spark, dir, "Bm25Index.append") {
        recoverCommit(spark, dir)
        writeTf(tfFromRows(rows), dlFromRows(rows), dir, nBuckets,
          SaveMode.Append, needCount = false, repartitionByBucket = false); ()
      }

  private def appendImpl(
      spark: SparkSession,
      dir: String,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      checkPresence: Boolean,
      checkBatchUnique: Boolean): Long = {
    recoverCommit(spark, dir)
    val nBuckets = loadParams(spark, dir)
    if (checkBatchUnique) {
      val ids = newDocs.select(col(idCol).cast("long").as("id"))
      require(ids.groupBy("id").count().filter(col("count") > 1).isEmpty,
        "Bm25Index.append: duplicate ids within the appended batch")
    }
    if (checkPresence) {
      val ids = newDocs.select(col(idCol).cast("long").as("id"))
      require(readDoclens(spark, dir).select("id").join(ids, "id").isEmpty,
        "Bm25Index.append: id already present in the index")
    }
    writeState(newDocs, idCol, textCol, dir, nBuckets, SaveMode.Append)
  }

  /** BM25 top-k retrieval AGAINST THE INDEXED CORPUS — exactly
    * [[Bm25.scoreTopK]]'s contract and output (query_id, id, score, rnk),
    * computed from persisted state through the SAME shared scoring tail
    * ([[Bm25.scoreFrom]]), so the probe cannot drift from the one-shot:
    * identical formula, identical 4-dp round-before-rank tie rule,
    * N/avgdl from `doclens/`. A probe of an index built from `docs`
    * equals `scoreTopK(docs, …)` row for row.
    *
    * Probe cost: the query batch's distinct terms hash to a bucket set
    * (collected driver-side — bounded by the query batch, the IvfIndex
    * probed-cid convention, and CAPPED at `maxDriverQueryTerms` rows:
    * past the cap the collect would gamble the driver, so the probe
    * falls back to the distributed shape — distinct bucket ids only on
    * the driver, left-semi term pruning, qterms shuffled on term
    * instead of broadcast — with rank-identical results), and only
    * those partition directories are listed and scanned. Per-term df is counted inside the pruned read
    * (complete — a term's postings never span buckets); the (id, th)
    * doclens join ships candidate-sized hits against the narrow doclens
    * table and erases every uncommitted epoch; the ranking window
    * partitions per query.
    *
    * `preDoclens`: a pre-read `doclens/` frame (from [[readDoclens]],
    * ideally lazy-localCheckpoint-ed) to reuse for BOTH the N/avgdl
    * stats aggregation and the candidate join — per-batch callers that
    * already scanned doclens for a freshness anti-join pass it so the
    * corpus table is scanned once per batch, not three times. None =
    * read from the index.
    */
  def searchTopK(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      qIdCol: String,
      qTextCol: String,
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75,
      preDoclens: Option[DataFrame] = None,
      preQTerms: Option[DataFrame] = None,
      preNBuckets: Option[Int] = None,
      maxDriverQueryTerms: Int = 100000): DataFrame = {
    require(maxDriverQueryTerms > 0,
      "Bm25Index.searchTopK: maxDriverQueryTerms must be positive")
    val nBuckets = preNBuckets.getOrElse(loadParams(spark, dir))
    // preQTerms: a caller-supplied (query_id, term[, qw]) frame — a
    // streaming micro-batch that already tokenized the batch for its
    // index append ([[tokenRows]] → [[tfFromRows]]) derives the
    // query-term set from the same checkpointed pass (tf rows are
    // unique per (id, term), matching queryTerms' per-document
    // distinctness) instead of re-tokenizing the text
    preQTerms.foreach { q =>
      require(q.columns.contains("query_id") && q.columns.contains("term"),
        "Bm25Index.searchTopK: preQTerms needs (query_id, term) columns")
    }
    val qterms0 = preQTerms.getOrElse(
      Bm25.queryTerms(queries, qIdCol, qTextCol))
    // lazy checkpoint: the limit-probe below consumes one evaluation,
    // and the over-cap fallback consumes THREE more (bucket distinct,
    // left-semi prune, scoring join) — without it a corpus-sized query
    // frame would pay its tokenization four times; the serving path
    // pays one batch-sized cache it would have paid as a broadcast
    // anyway
    val qtWithBucket = qterms0
      .withColumn("__bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .localCheckpoint(eager = false)
    // ONE BOUNDED driver collect serves the bucket set (the static
    // partition filter that prunes the postings listing), AND the
    // query-term relation itself: the scoring join broadcasts qterms
    // anyway — a broadcast IS a driver materialization — so collecting
    // it here costs nothing extra at SERVING scale and saves the
    // per-batch jobs that re-derived the same rows for the bucket
    // distinct. But the probe's contract is "serving-sized query
    // batch", and nothing used to enforce it: a caller handing a
    // corpus-sized query frame to the public API would OOM the driver
    // on this collect before the broadcast ever got the chance. The
    // limit(cap+1) probe decides in one pass: fewer than cap+1 rows
    // back means that WAS the whole relation (use it); cap+1 means the
    // query side is over the cap — fall back to the distributed shape
    // (distinct bucket ids only, ≤ nBuckets rows on the driver; term
    // pruning via left-semi join; qterms stays a lazy frame shuffled
    // on term into tfdf's partitioning instead of broadcast).
    // saturating +1: maxDriverQueryTerms = Int.MaxValue (the "disable
    // the cap" idiom) must not wrap to a negative limit and throw
    val probeN =
      if (maxDriverQueryTerms == Int.MaxValue) Int.MaxValue
      else maxDriverQueryTerms + 1
    // corpus stats (N, avgdl: one tiny agg over the caller-checkpointed
    // doclens frame) ride the SAME collect as the query-term probe,
    // union-encoded as one null-padded trailer row (`__n_docs` is
    // non-null exactly on the stats row — count() can't be null): the
    // probe pays driver round-trips per call, and a micro-batch serving
    // loop pays them per batch, so one action for both beats two
    val dl = preDoclens.getOrElse(readDoclens(spark, dir))
    val qtPart = qtWithBucket.limit(probeN)
      .withColumn("__n_docs", lit(null).cast("double"))
      .withColumn("__avgdl", lit(null).cast("double"))
    val statsPart = dl
      .agg(count(lit(1)).cast("double").as("__n_docs"),
        avg("dl").as("__avgdl"))
      .select(qtWithBucket.schema.map(f =>
        lit(null).cast(f.dataType).as(f.name)) ++
        Seq(col("__n_docs"), col("__avgdl")): _*)
    val collected = qtPart.unionByName(statsPart).collect()
    val statsIdx = collected.head.length - 2 // __n_docs position
    val statsRow = collected.find(r => !r.isNullAt(statsIdx)).getOrElse(
      throw new IllegalStateException(
        "Bm25Index.searchTopK: stats trailer row missing from the probe"))
    val qtCollected = collected.filter(r => r.isNullAt(statsIdx))
    if (qtCollected.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], searchSchema)
    val fitsDriver = qtCollected.length <= maxDriverQueryTerms
    val nDocs = statsRow.getDouble(statsIdx)
    val avgdl =
      if (statsRow.isNullAt(statsIdx + 1)) 0.0
      else statsRow.getDouble(statsIdx + 1)
    // candidate generation in ONE term-keyed exchange: repartition by
    // term, then the duplicate collapse (a retried crashed append stages
    // its postings TWICE before the single doclens commit — identical
    // rows, so max == tf) and the per-term document-frequency count both
    // reuse that partitioning (hash(term) clusters every finer grain) —
    // where the former groupBy(term,id,th) + groupBy(term) + join-back
    // shape paid three exchanges and re-shipped the candidates twice.
    // Term-level pruning on top of the bucket partition filter: the
    // bucket cut is directory-grain and degenerates to a full postings
    // scan once a wide-vocabulary query batch hashes into every bucket;
    // dropping every non-query term BEFORE the exchange makes candidate
    // volume "postings of the query's terms", the quantity the probe's
    // cost model promises, instead of "postings of every co-bucketed
    // term" — an InSet filter when the term set rode the qterms collect,
    // a left-semi join in the over-cap fallback.
    val (pruned, qterms, broadcastQ) =
      if (fitsDriver) {
        // row layout: qterms0 cols ++ (__bucket, __n_docs, __avgdl)
        val buckets = qtCollected.map(r => r.getLong(r.length - 3)).distinct
        val q = {
          import scala.jdk.CollectionConverters._
          spark.createDataFrame(
            qtCollected.map(r => org.apache.spark.sql.Row(r.toSeq.dropRight(3): _*))
              .toList.asJava,
            qterms0.schema)
        }
        val termSet = qtCollected.map(_.getString(
          qterms0.schema.fieldIndex("term"))).toSet
        (readPostings(spark, dir)
          .filter(col("bucket").isin(buckets.toSeq: _*))
          .filter(col("term").isInCollection(termSet)), q, true)
      } else {
        // over the cap: only the DISTINCT bucket ids touch the driver
        // (≤ nBuckets by construction); everything else stays lazy —
        // derived from the CHECKPOINTED frame so the three consumers
        // share one tokenization pass
        val buckets = qtWithBucket.select("__bucket").distinct()
          .collect().map(_.getLong(0))
        val qtermsLazy = qtWithBucket.drop("__bucket")
        (readPostings(spark, dir)
          .filter(col("bucket").isin(buckets.toSeq: _*))
          .join(qtermsLazy.select("term").distinct(), Seq("term"), "left_semi"),
          qtermsLazy, false)
      }
    val tfdf = pruned
      .select(col("term"), col("id"), col("th"), col("tf"))
      .repartition(col("term"))
      .groupBy("term", "id", "th").agg(max("tf").as("tf"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("term")))
    Bm25.scoreJoined(tfdf, dl, nDocs, avgdl, qterms, Seq("id", "th"),
      topK, k1, b, broadcastQ = broadcastQ)
  }

  /** Bucket-level occupancy: (bucket, n_rows, n_terms, max_term_rows) —
    * the [[graft.dedup.LshDedupIndex.stats]] family. Probe cost follows
    * the hottest bucket a query hashes into; a bucket whose term count
    * collapses relative to the others signals a degenerate hash or a
    * stopword-dominated corpus (raise nBuckets, or stoplist upstream).
    */
  def stats(spark: SparkSession, dir: String): DataFrame =
    readPostings(spark, dir)
      .groupBy("bucket", "term").agg(count(lit(1)).as("__t"))
      .groupBy("bucket")
      .agg(sum("__t").cast("long").as("n_rows"),
        count(lit(1)).as("n_terms"),
        max("__t").cast("long").as("max_term_rows"))

  /** Maintenance: reclaim invisible postings — orphans of crashed
    * appends (no doclens row for their (id, th) epoch, including the
    * stale epoch of an id that was later re-appended with different
    * text) and the duplicate rows of retried appends — and compact small
    * files. Rewrite-then-swap with on-entry crash recovery — the
    * [[graft.dedup.LshDedupIndex.vacuum]] contract verbatim. Probe
    * results are unchanged by construction: everything reclaimed was
    * already invisible through the (id, th) join. Single-writer enforced:
    * vacuum and [[append]] both hold the [[graft.util.IndexLock]] writer
    * lock, so an append cannot land inside the swap window. Returns the
    * number of postings rows reclaimed.
    */
  def vacuum(spark: SparkSession, dir: String, doclenFiles: Int = 0): Long =
    graft.util.IndexLock.withLock(spark, dir, "Bm25Index.vacuum") {
      vacuumImpl(spark, dir, doclenFiles)
    }

  private val CommitTables = Seq("params", "postings", "doclens")
  private val BuildMarker = "_build_commit"

  /** Crash recovery for [[build]]'s marker-protected swap AND for
    * markerless `.tmp`/`.old` debris (a crashed [[vacuum]] swap) — run
    * at every writer entry; the streaming ingest gate calls it from its
    * in-lock committed-set thunk like the ANN families do.
    */
  private[graft] def recoverCommit(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    graft.util.StagedTables.recover(fs, dir, BuildMarker, CommitTables,
      "Bm25Index.recover") {
      graft.util.IngestState.clear(spark, dir)
    }
  }

  private def vacuumImpl(spark: SparkSession, dir: String, doclenFiles: Int): Long = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    recoverCommit(spark, dir)
    val nBuckets = loadParams(spark, dir)

    val dl = readDoclens(spark, dir)
    val postings = readPostings(spark, dir)
      .select("term", "id", "th", "tf")
    val live = postings
      .join(dl.select("id", "th"), Seq("id", "th"), "left_semi")
      // duplicates from a retried append are IDENTICAL rows (same batch,
      // same tokenize, same epoch) — max collapses them to the original
      // tf; sum would double-count
      .groupBy("id", "th", "term").agg(max("tf").as("tf"))
    val reclaimed = postings.count() - live.count()

    live
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(s"$dir/postings.tmp")
    val nDlFiles =
      if (doclenFiles > 0) doclenFiles
      else spark.sparkContext.defaultParallelism
    dl.repartition(nDlFiles)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/doclens.tmp")

    def swap(table: String): Unit = {
      val live0 = new Path(s"$dir/$table")
      val old = new Path(s"$dir/$table.old")
      val tmp = new Path(s"$dir/$table.tmp")
      require(fs.rename(live0, old), s"Bm25Index.vacuum: could not stage $live0")
      require(fs.rename(tmp, live0), s"Bm25Index.vacuum: could not commit $tmp")
      fs.delete(old, true)
    }
    swap("postings")
    swap("doclens")
    reclaimed
  }
}
