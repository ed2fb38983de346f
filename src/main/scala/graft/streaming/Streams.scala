package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the `events` table (added scope —
  * the reference is purely batch, SURVEY.md §2.9). Each operator has a
  * batch twin with identical semantics so correctness is DuckDB-checkable;
  * the streaming form adds watermarks/state, nothing else.
  */
object Streams {

  /** Historic events.parquet generations carried TIMESTAMP(NANOS) → read
    * ts as long (see [[graft.sources.Lake.events]]); streaming sources
    * need the schema up front. Current generations carry
    * TIMESTAMP(MICROS) and resolve to a native timestamp — [[eventsStream]]
    * dispatches on one batch footer read.
    */
  val eventsLongSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def tsToTimestamp(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long layout: truncate to micros
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // native timestamp (micros) layout: session-tz cast only
        df.withColumn("ts", col("ts").cast(TimestampType))
    }

  /** Streaming source over a directory of events parquet files. The
    * stream schema must match the files' layout (nanos-as-long vs native
    * micros — both exist across driver testdata generations), so one
    * batch footer read picks it before the stream is constructed. An
    * EMPTY source directory — a normal starting state for a file stream
    * (files arrive later) — has no footer to read; the inference failure
    * falls back to [[eventsLongSchema]] instead of failing stream
    * construction. A MISSING directory still fails loudly (a typo'd
    * path must not become a silent empty stream with a guessed schema).
    *
    * SESSION-CONF CAVEAT: this sets `spark.sql.legacy.parquet.nanosAsLong`
    * for the stream's lifetime and does NOT restore it — the flag must
    * stay on while micro-batches read nanos-layout files. The drain
    * helpers ([[drainToMemorySink]]) restore the pre-call value after
    * the stream terminates; a direct caller owning the stream lifecycle
    * owns the restore too, or unrelated TIMESTAMP(NANOS) reads in the
    * same session will decode as longs.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"eventsStream: no such directory: $dir")
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("infer schema") =>
          eventsLongSchema
      }
    tsToTimestamp(spark.readStream.schema(fileSchema).parquet(dir))
  }

  /** The file stream source requires a DIRECTORY; a single-file input is
    * staged into a scratch dir (symlink when the filesystem allows, copy
    * otherwise) registered for JVM-exit cleanup.
    */
  /** Symlink-or-copy one existing file into a staging dir. */
  private def stageFile(dir: java.nio.file.Path, name: String,
      f: java.io.File): Unit = {
    val target = dir.resolve(name)
    try java.nio.file.Files.createSymbolicLink(target, f.toPath)
    catch { case _: Exception =>
      java.nio.file.Files.copy(f.toPath, target)
    }
  }

  private def stageDir(path: String): String = {
    val f = new java.io.File(path)
    // fail fast: a symlink to a missing target succeeds at creation time
    // and the stream would silently drain zero rows
    require(f.isFile || f.isDirectory, s"no such path: $path")
    if (f.isDirectory) path
    else {
      val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
      graft.util.TempDirs.register(dir.toString)
      stageFile(dir, f.getName, f)
      dir.toString
    }
  }

  /** Tumbling/sliding window aggregation with watermark:
    * counts + sum(value) per (window, event_type). `slide == size` →
    * tumbling. Late data beyond the watermark is dropped.
    */
  def windowedAgg(events: DataFrame, size: String = "1 hour",
      slide: Option[String] = None, watermark: String = "2 hours"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col("ts"), size, s)
      case None    => window(col("ts"), size)
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(unix_timestamp(col("w.start")).cast("long").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  private val memorySinkSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Drain a streaming frame into a Complete-mode memory sink with
    * `AvailableNow` and return the materialized table — the
    * oracle-comparable surface for streaming-EXECUTED correctness
    * entries. Unique sink name (memory-sink tables are session-global;
    * bench reruns must not collide), explicit checkpoint under JVM-exit
    * cleanup (the engine would otherwise warn and create an unmanaged
    * temp checkpoint), and the nanosAsLong flag [[eventsStream]] flips is
    * restored afterwards — a shared bench session must not see an
    * order-dependent conf change.
    */
  private def drainToMemorySink(spark: SparkSession, streamed: => DataFrame,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val name = s"graft_stream_sink_${memorySinkSeq.incrementAndGet()}"
    val checkpoint = java.nio.file.Files.createTempDirectory("graft_stream_ckpt")
    graft.util.TempDirs.register(checkpoint.toString)
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    // `streamed` is BY-NAME and must only be forced after this capture:
    // constructing it calls eventsStream, which flips the flag — an eager
    // parameter would capture the already-flipped value and make the
    // restore below a no-op
    val prevNanos = spark.conf.getOption(nanosKey)
    try {
      streamed.writeStream
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint.toString)
        .outputMode(mode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
    } finally {
      prevNanos match {
        case Some(v) => spark.conf.set(nanosKey, v)
        case None    => spark.conf.unset(nanosKey)
      }
    }
    spark.table(name)
  }

  /** Run [[windowedAgg]] as an ACTUAL streaming execution — `readStream` →
    * watermarked window agg → memory sink, drained with `AvailableNow` —
    * and return the materialized result. This is the correctness harness
    * for the streaming path itself (the batch twin checks semantics; this
    * checks the streaming EXECUTION produces them): `Complete` output mode
    * keeps every window in the sink, so a bounded replay equals the batch
    * aggregation row-for-row.
    *
    * Bounded-input harness by design — a production deployment writes
    * `Append` with the watermark evicting state to a durable sink; the
    * memory sink here is the oracle-comparable surface.
    */
  def windowedAggOnce(spark: SparkSession, eventsPath: String,
      size: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    drainToMemorySink(spark,
      windowedAgg(eventsStream(spark, stageDir(eventsPath)), size,
        slide = None, watermark = watermark))

  /** Stream-static enrichment, EXECUTED: the event stream joins a static
    * dimension (resolved fresh per micro-batch; Catalyst broadcasts the
    * dim exactly as in batch) and aggregates per segment — the canonical
    * production streaming-enrichment pattern, drained like
    * [[windowedAggOnce]] so the result is batch-oracle-comparable.
    */
  def enrichBySegmentOnce(spark: SparkSession, eventsPath: String,
      customers: DataFrame): DataFrame =
    drainToMemorySink(spark,
      eventsStream(spark, stageDir(eventsPath))
        .join(broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
          col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value")))

  /** Streaming ANN serving, EXECUTED micro-batch form — the Spark-shaped
    * answer to "online" similarity search over a persisted index (a true
    * per-request server is out of Spark's execution model; micro-batch
    * probing is what Structured Streaming offers): each arriving batch of
    * query vectors runs the partition-pruned [[graft.knn.IvfIndex]] batch
    * probe via `foreachBatch` — the per-batch centroid math is bounded
    * driver work, the inverted-list scan stays distributed and pruned —
    * and results append to `outDir` as the streaming sink. The index
    * directory is shared state: appends to the index between batches are
    * picked up by the next batch's probe (each probe re-reads the
    * manifest-free parquet layout).
    *
    * `queriesDir` is a directory of parquet files with (idCol, vecCol)
    * columns; `maxFilesPerTrigger` bounds batch size (queries per batch ×
    * k rows of output state — nothing else accumulates). Returns the
    * union of all batches' results read back from `outDir`.
    *
    * `outDir` is OWNED by the call: it is cleared first, so a re-run
    * (whose fresh checkpoint replays every source file) returns one
    * result set instead of appending a duplicate copy per invocation.
    * An empty `queriesDir` returns an empty, correctly-shaped frame.
    */
  def knnEnrichOnce(
      spark: SparkSession,
      queriesDir: String,
      querySchema: StructType,
      indexDir: String,
      outDir: String,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val checkpoint = java.nio.file.Files.createTempDirectory("graft_knn_ckpt")
    graft.util.TempDirs.register(checkpoint.toString)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(outPath, true)
    // one (centroids, metric) load per LOOP, not per batch — the
    // generation-keyed MetaMemo contract the ingest family runs: an
    // index maintenance op committing between batches swaps the memo'd
    // tables and forces a reload; plain appends (the shared-state case
    // this serving loop documents) keep the cached copy
    val metaMemo = new MetaMemo[(Array[Array[Float]], String)]
    spark.readStream
      .schema(querySchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(queriesDir)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val sp = batch.sparkSession
        val meta = metaMemo.getOrLoad(graft.knn.IvfIndex.metaGen(sp, indexDir)) {
          val (c, m, _) = graft.knn.IvfIndex.loadIndexMeta(sp, indexDir)
          (c, m)
        }
        graft.knn.IvfIndex
          .search(sp, indexDir, batch.toDF(), idCol, vecCol,
            k, nProbe, preMeta = Some(meta))
          .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpoint.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
      .awaitTermination()
    if (fs.exists(outPath)) spark.read.parquet(outDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.knn.IvfIndex.searchSchema)
  }

  /** Write `df` as ONE parquet file at `dir/name` with an explicit
    * modification time. The file stream source orders files by
    * (modification time, path) — staged batches therefore replay in a
    * DETERMINISTIC order, which matters whenever batch N+1 must observe
    * state batch N wrote (the [[dedupIngestOnce]] contract).
    *
    * Pure Hadoop-FileSystem implementation, so `dir` may live on any
    * configured filesystem (local, hdfs://, s3a://): the single-file
    * write is staged into a DOT-PREFIXED scratch dir beside the target
    * (hidden-path-filtered by every Spark file listing, including the
    * file stream source, and on the same FS so the rename is atomic),
    * renamed into place, then `fs.setTimes` stamps the mtime — a failed
    * stamp is an ERROR when replay order is actually at stake: object
    * stores that ignore setTimes cannot honor the mtime contract. The
    * failure is scoped to where it matters — a directory holding ONE
    * staged batch has a vacuous replay order, so single-batch staging
    * keeps working on such stores; only the second batch staged into
    * the same directory fails. `requireMtimeOrder = false` is the
    * explicit caller override for stores without setTimes support:
    * batches then replay in the file source's (upload-mtime, PATH)
    * order, so the caller must name batches in lexicographic replay
    * order (batch_a, batch_b, …) for determinism.
    */
  def stageBatch(df: DataFrame, dir: String, name: String, mtimeMs: Long,
      requireMtimeOrder: Boolean = true): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(dirPath, s".graft_stage_$name.tmp")
    fs.delete(tmp, true)
    df.repartition(1).write.mode("overwrite").parquet(tmp.toString)
    val parts = fs.globStatus(
      new org.apache.hadoop.fs.Path(tmp, "part-*.parquet"))
    require(parts != null && parts.length == 1,
      s"stageBatch: expected one part file under $tmp, " +
        s"found ${if (parts == null) 0 else parts.length}")
    val target = new org.apache.hadoop.fs.Path(dirPath, name)
    // setTimes is a SILENT no-op on stores that don't support it (the
    // Hadoop default is an empty body — object stores keep upload
    // mtimes), and the file stream orders batches by mtime. PROBE
    // support on the staged tmp part BEFORE touching the target: a
    // failed stamp breaks the 'batch N+1 observes batch N's state'
    // replay contract — but only once the directory holds MORE than
    // one staged batch (ordering one file is vacuous) — and refusing
    // here, pre-rename, leaves every previously staged batch INTACT
    // (a post-rename undo would destroy the prior version of a
    // re-staged same-name batch along with the new one).
    if (requireMtimeOrder) {
      fs.setTimes(parts.head.getPath, mtimeMs, -1)
      val supported =
        fs.getFileStatus(parts.head.getPath).getModificationTime == mtimeMs
      if (!supported) {
        val others = fs.exists(dirPath) && fs.listStatus(dirPath).exists { st =>
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".") && n != name &&
            !n.startsWith(".graft_stage_")
        }
        if (others) {
          fs.delete(tmp, true)
          throw new IllegalArgumentException(
            s"stageBatch: the mtime stamp does not take effect on this " +
              s"store (setTimes is a no-op), so the replay order of " +
              s"multiple batches staged under $dir cannot be " +
              "guaranteed — refusing BEFORE staging, so the directory " +
              "is unchanged. Stage one batch per directory, or pass " +
              "requireMtimeOrder = false and name batches in " +
              "lexicographic replay order (the file source falls back " +
              "to path order for equal mtimes)")
        }
      }
    }
    fs.delete(target, false)
    require(fs.rename(parts.head.getPath, target),
      s"stageBatch: could not move staged file into place at $target")
    fs.setTimes(target, mtimeMs, -1)
    fs.delete(tmp, true)
    ()
  }

  /** Streaming near-dup ingestion, EXECUTED: document batches arrive as a
    * file stream and each micro-batch is first PROBED against the
    * persisted [[graft.dedup.LshDedupIndex]] (online near-dup flagging:
    * candidates against everything ingested so far) and then APPENDED
    * into it — so a later batch's probe sees every earlier batch through
    * the index, exactly as a daily-ingest pipeline would dedup against
    * its full corpus history. Probe-before-append keeps a batch from
    * matching itself; within-batch duplicates are the batch-sized
    * [[graft.dedup.Dedup.minHashLshCandidates]]'s job, not this path's.
    *
    * Per batch the corpus-side work is ONE signatures scan (anti-join +
    * candidate fetch, shared) plus the band equi-join probe plus one
    * signature pass over the batch — corpus signatures are never
    * recomputed (the [[graft.dedup.LshDedupIndex]] scale contract).
    * Replay semantics are exactly-once PER DOCUMENT (the
    * [[lexIngestOnce]] contract): only not-yet-committed ids are probed
    * and appended, so a crash replay re-emits nothing. `outDir` is owned
    * by the call (cleared first, the [[knnEnrichOnce]] re-run
    * rationale); returns the union of all batches' candidate rows
    * (new_id, indexed_id, est_jaccard).
    */
  /** Shared driver for the file-staged micro-batch ingest family: temp
    * checkpoint (registered for cleanup), caller-owned `outDir` cleared,
    * one AvailableNow pass over the staged batch files, `perBatch` per
    * micro-batch. Returns the filesystem handle for the result read.
    */
  private def runFileBatches(
      spark: SparkSession,
      batchesDir: String,
      batchSchema: StructType,
      outDir: String,
      ckptPrefix: String,
      maxFilesPerTrigger: Int)(
      perBatch: (DataFrame, Long) => Unit): org.apache.hadoop.fs.FileSystem = {
    val checkpoint = java.nio.file.Files.createTempDirectory(ckptPrefix)
    graft.util.TempDirs.register(checkpoint.toString)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an explicit schema means a typo'd source path would become a
    // SILENT empty stream (zero batches, empty result) — after this
    // call has already cleared outDir of prior results. Fail loudly
    // instead (the eventsStream missing-dir contract).
    val src = new org.apache.hadoop.fs.Path(batchesDir)
    require(src.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(src),
      s"runFileBatches: batches directory does not exist: $batchesDir")
    fs.delete(outPath, true)
    spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(batchesDir)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        perBatch(batch.toDF(), batchId)
        ()
      }
      .option("checkpointLocation", checkpoint.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
      .awaitTermination()
    fs
  }

  /** The result channel of a [[runFileBatches]] run, or an empty frame
    * of the operator's schema when no batch ever wrote it. `dropBatch`
    * for batch-keyed channels (`<channel>/batch=<id>`), where partition
    * discovery adds the key column.
    */
  private def channelOrEmpty(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      path: String,
      emptySchema: StructType,
      dropBatch: Boolean): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(p)) {
      val df = spark.read.parquet(path)
      if (dropBatch) df.drop("batch") else df
    } else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
  }

  def dedupIngestOnce(
      spark: SparkSession,
      batchesDir: String,
      batchSchema: StructType,
      indexDir: String,
      outDir: String,
      idCol: String,
      textCol: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val dedupNbMemo = new MetaMemo[(Int, Int, Int)]
    val fs = runFileBatches(spark, batchesDir, batchSchema, outDir,
        "graft_dedup_ckpt", maxFilesPerTrigger) { (b, batchId) =>
      val sp = b.sparkSession
      // FRESH docs only — the ids the index does not already hold.
      // Probe-then-append over `fresh` (not the raw batch, the
      // [[lexIngestOnce]] pattern) makes replay EXACTLY-ONCE PER
      // DOCUMENT: a batch replayed after a crash between the index
      // commit and the stream checkpoint (or a whole-call rerun)
      // re-emits NOTHING, instead of probing itself against an index
      // that now contains it and emitting self-match rows (new_id ==
      // indexed_id at est_jaccard 1.0) no correct run produces. In
      // normal operation fresh == batch, so semantics are unchanged.
      // ONE signatures scan serves the anti-join and (lazy-
      // localCheckpoint-ed, via preSigs) the probe's candidate
      // signature fetch; append skips both re-checks — absence was
      // just established here, within-batch uniqueness is the input
      // contract (ids unique corpus-wide).
      // heal a crashed build/vacuum commit BEFORE the batch reads params
      // or signatures (safe unlocked under the index's single-writer
      // contract): the batch would otherwise sign under the OLD params
      // and then appendSigned's in-lock recovery would swap the NEW
      // tables live mid-batch, appending band rows the new params never
      // hashed
      graft.dedup.LshDedupIndex.recoverCommit(sp, indexDir)
      val sigs = graft.dedup.LshDedupIndex.readSignatures(sp, indexDir)
        .localCheckpoint(eager = false)
      val fresh = b.join(sigs.select(col("id")),
        b(idCol).cast("long") === sigs("id"), "left_anti")
        .localCheckpoint()
      if (!fresh.isEmpty) {
        // one MinHash kernel pass per batch, one params read per LOOP
        // (generation-keyed MetaMemo — a rebuild committing between
        // batches swaps params and forces a reload), shared by the
        // probe and the append — the dedupIngestBatch fast path
        val params @ (_, bands, rpb) = dedupNbMemo.getOrLoad(
            graft.dedup.LshDedupIndex.metaGen(sp, indexDir))(
          graft.dedup.LshDedupIndex.loadParams(sp, indexDir))
        val signed = graft.dedup.LshDedupIndex
          .signBatch(fresh, idCol, textCol, params)
        // batch-keyed Overwrite: a crash between this write and the
        // appendSigned commit leaves the docs fresh, so the replay
        // re-probes — an append-mode channel would then hold every row
        // twice (the lexIngestWatermarked exactly-once contract)
        graft.dedup.LshDedupIndex
          .candidatesAgainst(sp, indexDir, fresh, idCol, textCol,
            preSigs = Some(sigs), preSigned = Some(signed),
            preParams = Some(params))
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
        graft.dedup.LshDedupIndex.appendSigned(sp, indexDir, signed,
          bands, rpb, takeLock = true)
      }
    }
    channelOrEmpty(spark, fs, outDir,
      graft.dedup.LshDedupIndex.candidateSchema, dropBatch = true)
  }

  /** Streaming lexical-index ingestion, EXECUTED: document batches
    * arrive as a file stream and each micro-batch is first SEARCHED
    * against the persisted [[graft.text.Bm25Index]] (BM25 top-k of every
    * batch document against everything ingested so far) and then
    * APPENDED into it — a later batch's search sees every earlier batch
    * through the index, and the corpus statistics the scores use
    * (N, avgdl, per-term df) advance batch over batch exactly as the
    * committed corpus grows. Search-before-append keeps a batch from
    * matching itself.
    *
    * Per batch the corpus-side work is the bucket-pruned postings probe
    * plus one tokenize pass over the batch (the [[graft.text.Bm25Index]]
    * scale contract — postings are never re-derived). Replay semantics
    * are exactly-once PER DOCUMENT: only not-yet-committed ids are
    * searched and appended, so a batch replayed after a crash between
    * the index commit and the stream checkpoint re-emits nothing instead
    * of re-searching itself against an index that now contains it (a
    * crash between the postings stage and the doclens commit replays
    * cleanly — the uncommitted epoch is probe-invisible). `outDir` is
    * owned by the call (cleared first); returns the union of all
    * batches' search rows (query_id, id, score, rnk).
    */
  def lexIngestOnce(
      spark: SparkSession,
      batchesDir: String,
      batchSchema: StructType,
      indexDir: String,
      outDir: String,
      idCol: String,
      textCol: String,
      topK: Int = 10,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val nbMemo = new MetaMemo[Int] // one params read per loop, not per batch
    val fs = runFileBatches(spark, batchesDir, batchSchema, outDir,
        "graft_lex_ckpt", maxFilesPerTrigger) { (b, batchId) =>
      lexOnceBatch(b.sparkSession, indexDir, outDir, batchId, b,
        idCol, textCol, topK, nbMemo)
    }
    channelOrEmpty(spark, fs, outDir,
      graft.text.Bm25Index.searchSchema, dropBatch = true)
  }

  /** Generation-keyed one-slot memo for index metadata that appends
    * never touch (BM25 nBuckets, LSH band params, IVF centroids/metric/
    * codebooks): loading them once per LOOP instead of once per BATCH
    * deletes one metadata read per micro-batch from the q9x serving
    * floor (the q98 phase ledger's per-batch machinery).
    *
    * The memo is NOT unconditional, because "append-immutable" is not
    * "loop-immutable": a rebuild/rebalance can commit — or be CRASH-
    * RECOVERED by this loop's own in-lock `recoverSwap`/`recoverCommit`
    * — BETWEEN batches, swapping the very tables the memo caches. An
    * unkeyed memo would then keep serving the pre-swap IVF centroids
    * and silently file later batches' vectors into lists whose
    * quantizer was replaced (or band LSH signatures under dead params).
    * Each `getOrLoad` therefore revalidates against the index's commit
    * generation (the family's `metaGen` — a filesystem-metadata
    * fingerprint of the swap-committed tables, zero Spark jobs, read
    * AFTER the batch's in-lock recovery): same generation → cached
    * value; any committed swap → reload. Each loop creates its own
    * memo; the default-argument form gives direct spec/probe callers a
    * fresh instance per call.
    */
  private[graft] final class MetaMemo[A] {
    private val ref =
      new java.util.concurrent.atomic.AtomicReference[Option[(Long, A)]](None)
    def getOrLoad(gen: Long)(load: => A): A = ref.get match {
      case Some((g, v)) if g == gen => v
      case _ =>
        val v = load
        ref.set(Some((gen, v)))
        v
    }
  }

  /** One micro-batch of [[lexIngestOnce]] — extracted so the late
    * re-ingest loop ([[lexReingestLate]]) can drive a frame it already
    * holds through the IDENTICAL body without the staged-file round
    * trip (single-file write + stream source + checkpoint), which the
    * q98 phase ledger showed to be pure machinery.
    */
  private def lexOnceBatch(
      sp: SparkSession,
      indexDir: String,
      outDir: String,
      batchId: Long,
      b: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int,
      nbMemo: MetaMemo[Int] = new MetaMemo[Int]): Unit = {
    // FRESH docs only — the ids the index does not already hold.
    // Search-then-append over `fresh` (not the raw batch) keeps the
    // "a document's search sees exactly the pre-commit index state"
    // invariant across crash replays too: a batch already fully
    // committed (crash after append, before the checkpoint; or a
    // whole-call rerun) re-emits NOTHING rather than re-searching
    // itself against an index that now contains it. ONE doclens scan
    // per batch: the lazy-localCheckpoint-ed read serves the
    // anti-join AND (via preDoclens) the probe's N/avgdl stats and
    // candidate join; append skips both re-checks — absence was just
    // established here, within-batch uniqueness is the input
    // contract.
    // heal a crashed build/vacuum commit BEFORE the batch reads params
    // or doclens — see dedupIngestOnce
    graft.text.Bm25Index.recoverCommit(sp, indexDir)
    val dl = graft.text.Bm25Index.readDoclens(sp, indexDir)
      .localCheckpoint(eager = false)
    val fresh = b.join(dl.select(col("id")),
      b(idCol).cast("long") === dl("id"), "left_anti")
      .localCheckpoint()
    if (!fresh.isEmpty) {
      // one tokenize pass per batch, one params read per LOOP
      // (generation-keyed MetaMemo — a rebuild committing between
      // batches swaps params and forces a reload), shared by probe
      // and append
      val nb = nbMemo.getOrLoad(graft.text.Bm25Index.metaGen(sp, indexDir))(
        graft.text.Bm25Index.loadParams(sp, indexDir))
      val rows = graft.text.Bm25Index
        .tokenRows(fresh, idCol, textCol)
        .localCheckpoint(eager = false)
      // batch-keyed Overwrite — crash-replay exactly-once, see
      // dedupIngestOnce
      graft.text.Bm25Index
        .searchTopK(sp, indexDir, fresh, idCol, textCol, topK,
          preDoclens = Some(dl),
          preQTerms = Some(graft.text.Bm25Index.tfFromRows(rows)
            .select(col("id").as("query_id"), col("term"))),
          preNBuckets = Some(nb))
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
      graft.text.Bm25Index.appendRows(sp, indexDir, rows, nb,
        takeLock = true)
    }
  }

  /** Close the late-audit loop in ONE call: recover the `late/` channel
    * of a gated run ([[lateRows]]) and drive it through the non-gated
    * ingest body DIRECTLY — the late rows are already in hand when
    * `lateRows` returns, so staging them back to files and replaying
    * them through a second streaming session (file write + stream
    * source + checkpoint round trip) is pure machinery. The q98 phase
    * ledger (IngestPhaseProbe, sf0.1 warm) measured that machinery at
    * ~0.25 s of the ~3.2 s loop — the dominant cost is the ingest BODY
    * itself (doclens anti-join, tokenize, probe, append: ~20 jobs),
    * which both routes share by construction. Semantics are IDENTICAL
    * to `stageBatch` + [[lexIngestOnce]] over the same rows (same
    * per-batch body): the freshness anti-join dedups against committed
    * state, so the call is replay-safe — a second invocation emits
    * nothing. The staged-file route remains the right shape when the
    * re-ingest happens in a LATER session than the gated run.
    *
    * `outDir` is owned by the call (cleared first); returns the search
    * rows of the re-admitted documents (empty frame when the audit
    * channel has no recoverable rows).
    */
  def lexReingestLate(
      spark: SparkSession,
      gatedOutDir: String,
      indexDir: String,
      outDir: String,
      idCol: String,
      textCol: String,
      topK: Int = 10): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(outPath, true)
    lateRows(spark, gatedOutDir).foreach { late =>
      lexOnceBatch(spark, indexDir, outDir, 0L, late, idCol, textCol, topK)
    }
    channelOrEmpty(spark, fs, outDir,
      graft.text.Bm25Index.searchSchema, dropBatch = true)
  }

  /** [[lexReingestLate]]'s contract on the persistent IVF family: recover
    * the `late/` channel of a gated [[annIngestWatermarked]] run and drive
    * it through the non-gated ingest body directly — freshness anti-join
    * against the committed assignments, probe against the index AS OF the
    * call (batch-keyed under `outDir`, exactly-once), then append. The
    * anti-join makes the call replay-safe (a second invocation emits
    * nothing), and the whole body runs under the index's writer lock —
    * one maintenance op, like the gated micro-batch it completes.
    *
    * `outDir` is owned by the call (cleared first); returns the probe
    * rows of the re-admitted vectors (empty frame when the audit channel
    * has no recoverable rows).
    */
  def annReingestLate(
      spark: SparkSession,
      gatedOutDir: String,
      indexDir: String,
      outDir: String,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      nProbe: Int = 4): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(outPath, true)
    lateRows(spark, gatedOutDir).foreach { late =>
      graft.util.IndexLock.withLock(spark, indexDir, "ann-reingest") {
        // crashed-rebalance recovery BEFORE the committed-id read — the
        // annIngestBatch ordering, for the same reason (a half-committed
        // swap has no live assignments dir to read)
        graft.knn.IvfIndex.recoverSwap(spark, indexDir)
        val ids = graft.knn.IvfIndex.readIds(spark, indexDir)
          .localCheckpoint(eager = false)
        val fresh = late.join(ids,
          late(idCol).cast("long") === ids("id"), "left_anti")
          .localCheckpoint()
        if (!fresh.isEmpty) {
          // ONE metadata load shared by probe and append — the
          // annIngestBatch fast path
          val (centroids, metric, pq) =
            graft.knn.IvfIndex.loadIndexMeta(spark, indexDir)
          graft.knn.IvfIndex.search(spark, indexDir, fresh, idCol, vecCol,
              k, nProbe, preMeta = Some((centroids, metric)))
            .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=0")
          graft.knn.IvfIndex.appendPrepared(spark, indexDir, fresh, idCol,
            vecCol, centroids, metric, pq)
        }
      }
    }
    channelOrEmpty(spark, fs, outDir,
      graft.knn.IvfIndex.searchSchema, dropBatch = true)
  }

  /** [[annReingestLate]] on the sharded HNSW family: late rows of a gated
    * [[hnswIngestWatermarked]] run anti-join against the live manifest's
    * ids, beam-probe the graph AS OF the call, then insert via the
    * generation-committed append. Same lock/replay contract as the IVF
    * twin; the search channel is approximate (HNSW recall), so oracles
    * over this call pin membership, not neighbor sets.
    */
  def hnswReingestLate(
      spark: SparkSession,
      gatedOutDir: String,
      indexDir: String,
      outDir: String,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      efSearch: Int = 64): DataFrame = {
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(outPath, true)
    lateRows(spark, gatedOutDir).foreach { late =>
      graft.util.IndexLock.withLock(spark, indexDir, "hnsw-reingest") {
        // heal a reshard that died mid-swap before reading the manifest —
        // the hnswIngestBatch ordering
        graft.knn.HnswIndex.recoverReshard(spark, indexDir)
        val ids = graft.knn.HnswIndex.readIds(spark, indexDir)
          .localCheckpoint(eager = false)
        val fresh = late.join(ids,
          late(idCol).cast("long") === ids("id"), "left_anti")
          .localCheckpoint()
        if (!fresh.isEmpty) {
          // ONE params load shared by probe and append; the append skips
          // the guards the anti-join just established — the
          // annReingestLate/hnswIngestBatch fast path
          val params = graft.knn.HnswIndex.loadParams(spark, indexDir)
          graft.knn.HnswIndex.search(spark, indexDir, fresh, idCol, vecCol,
              k, efSearch, preParams = Some(params))
            .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=0")
          graft.knn.HnswIndex.append(spark, indexDir, fresh, idCol, vecCol,
            takeLock = false, checkBatchUnique = false, checkPresence = false,
            preParams = Some(params))
        }
      }
    }
    channelOrEmpty(spark, fs, outDir,
      graft.knn.IvfIndex.searchSchema, dropBatch = true)
  }

  /** [[lexIngestOnce]] with an EVENT-TIME LATENESS GATE — the answer to
    * out-of-order arrival that the plain ingester has no opinion on
    * (its index appends are commutative, so reordering on-time batches
    * is harmless; what needs a contract is data arriving AFTER the
    * pipeline has moved on).
    *
    * Contract (explicit, replay-deterministic — Spark's built-in
    * `withWatermark` state does not survive `foreachBatch` index writes,
    * so the watermark here is engine-owned):
    *
    *  - `tsCol` is a LONG event-time column in any monotone unit;
    *  - the watermark starts at Long.MinValue and after every batch
    *    advances to `max(previous, max(tsCol in batch) - lateness)` —
    *    late rows carry old times, so they never push it forward;
    *  - a row is LATE iff its ts is below the watermark AS OF THE START
    *    of its batch: it is DROPPED from the index (never searched,
    *    never appended) and recorded under `<outDir>/late` as (id, ts),
    *    batch-keyed and overwritten per batch (exactly-once even across
    *    crash replays) — provably handled, auditable, re-ingestable by
    *    an operator;
    *  - a row with NULL event time is unclassifiable and is audited to
    *    `late/` (ts NULL) rather than admitted — or silently dropped,
    *    which is what a bare pair of `ts < wm` / `ts >= wm` filters
    *    would do;
    *  - the watermark is PERSISTED ([[IngestWatermark]]: versioned
    *    direct-FS JSON under `<indexDir>/_ingest/`, crash-safe, zero
    *    Spark jobs), so a crash replay of an already-seen batch re-drops
    *    its late rows instead of admitting them against a reset
    *    watermark; the per-document anti-join (inherited from
    *    [[lexIngestOnce]]) independently keeps replayed COMMITTED rows
    *    exactly-once.
    *
    * End-state equivalence: the committed index equals a one-shot
    * [[graft.text.Bm25Index.build]] over base ∪ admitted rows — append
    * order cannot matter because the index state is per-document
    * (postings + doclens), which is what the q91 oracle pins through
    * the doclens table.
    *
    * Search rows of admitted fresh docs land under `<outDir>/search`
    * (NOT outDir itself — `late/` lives beside it) and are returned.
    */
  def lexIngestWatermarked(
      spark: SparkSession,
      batchesDir: String,
      batchSchema: StructType,
      indexDir: String,
      outDir: String,
      idCol: String,
      textCol: String,
      tsCol: String,
      lateness: Long,
      topK: Int = 10,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val nbMemo = new MetaMemo[Int] // one params read per loop, not per batch
    val fs = runFileBatches(spark, batchesDir, batchSchema, outDir,
        "graft_lexwm_ckpt", maxFilesPerTrigger) { (b, batchId) =>
      lexIngestBatch(b.sparkSession, indexDir, outDir, batchId,
        b, idCol, textCol, tsCol, lateness, topK, nbMemo)
    }
    channelOrEmpty(spark, fs, s"$outDir/search",
      graft.text.Bm25Index.searchSchema, dropBatch = true)
  }

  /** One micro-batch of [[lexIngestWatermarked]] — extracted so a spec
    * can replay an in-flight batch (same batchId twice, or a crash
    * between the search write and the index append) and assert the
    * exactly-once contract directly. The search channel is batch-keyed
    * (`search/batch=<id>`, Overwrite): a replayed batch overwrites its
    * own prior rows instead of appending duplicates.
    */
  private[graft] def lexIngestBatch(
      sp: SparkSession,
      indexDir: String,
      outDir: String,
      batchId: Long,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      lateness: Long,
      topK: Int,
      nbMemo: MetaMemo[Int] = new MetaMemo[Int]): Unit = {
    // lazy checkpoints: each frame is materialized by its first action
    // (the gate's one-pass agg) and reused from blocks after — eager
    // would pay one extra dedicated job per frame per batch
    val b = batch.localCheckpoint(eager = false)
    // freshness marker-join BEFORE the lateness split (inside the gate):
    // on a replay the watermark has already advanced past a committed
    // batch's event times, and classifying committed rows as late would
    // pollute the late/ audit channel — a row can only be late if the
    // index does not already hold it
    // LAZY val + in-thunk recovery: the frame is first forced inside the
    // writer lock, AFTER a crashed build/vacuum swap has been healed —
    // a frame constructed (and its file listing pinned) pre-lock could
    // read tables a concurrent or crashed commit was mid-rename on
    lazy val dl = graft.text.Bm25Index.readDoclens(sp, indexDir)
      .localCheckpoint(eager = false)
    watermarkGatedBatch(sp, indexDir, outDir, batchId, b, {
        graft.text.Bm25Index.recoverCommit(sp, indexDir)
        dl.select(col("id"))
      }, idCol, tsCol, lateness) { fresh =>
      // ONE tokenize pass for the whole batch: the tokenRows frame feeds
      // the probe's query-term set (preQTerms — tf rows are unique per
      // (id, term), matching queryTerms' array_distinct) AND the index
      // append (appendRows); params are read once per LOOP (generation-
      // keyed MetaMemo — revalidated against the commit fingerprint
      // AFTER this batch's in-lock recovery ran)
      val nb = nbMemo.getOrLoad(graft.text.Bm25Index.metaGen(sp, indexDir))(
        graft.text.Bm25Index.loadParams(sp, indexDir))
      val rows = graft.text.Bm25Index
        .tokenRows(fresh, idCol, textCol)
        .localCheckpoint(eager = false)
      sp.sparkContext.setJobDescription("graft ingest: search")
      graft.text.Bm25Index
        .searchTopK(sp, indexDir, fresh, idCol, textCol, topK,
          preDoclens = Some(dl),
          preQTerms = Some(graft.text.Bm25Index.tfFromRows(rows)
            .select(col("id").as("query_id"), col("term"))),
          preNBuckets = Some(nb))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/search/batch=$batchId")
      sp.sparkContext.setJobDescription("graft ingest: append")
      graft.text.Bm25Index.appendRows(sp, indexDir, rows, nb, takeLock = false)
    }
  }

  /** The operator-agnostic core of the event-time lateness gate — the
    * watermark contract is engine-wide, not a property of any one index
    * family, so [[lexIngestWatermarked]] (BM25) and
    * [[dedupIngestWatermarked]] (LSH) share it verbatim.
    *
    * `b` is the whole micro-batch (the watermark advances off its max
    * event time, index state notwithstanding — replay-deterministic);
    * `committedIds` is the index's current id set (one `id` column) —
    * the gate marker-joins it against the batch so freshness, the late
    * split, the batch max event time, and both emptiness checks all
    * come from ONE pass over the batch (a single scheduler round-trip
    * where a naive formulation pays four: b.isEmpty, fresh.isEmpty,
    * max(ts), plus a separate anti-join). `admit` commits the on-time
    * fresh rows (probe + append, with `takeLock = false` — see below)
    * and MUST write its output channel batch-keyed
    * (`<channel>/batch=<id>`, Overwrite) so a crash replay overwrites
    * rather than append-duplicates. Late and null-ts rows are audited
    * under `<outDir>/late` as the FULL original batch rows (the audit
    * channel is self-contained — [[lateRows]] re-ingests from it with
    * no upstream replay), keyed by `batch=<id>` and OVERWRITTEN per
    * batch: a crash replay of an in-flight batch re-derives the same
    * late set into the same directory instead of append-duplicating it
    * — the audit channel is exactly-once per batch. The watermark write happens AFTER
    * the commit: a crash inside the batch replays with the old watermark
    * (same late verdicts), and the marker join suppresses the
    * already-committed admitted rows.
    *
    * The WHOLE batch — watermark read, late audit, probe + append,
    * watermark advance — runs under the index's writer lock: the
    * micro-batch is one maintenance op. Without it, an index `build`
    * interleaving between this batch's append and its watermark write
    * would have its freshly-cleared `_ingest/` state resurrected by the
    * in-flight batch's stale watermark, silently routing the rebuilt
    * corpus's next ingest to late/.
    */
  private[graft] def watermarkGatedBatch(
      sp: SparkSession,
      indexDir: String,
      outDir: String,
      batchId: Long,
      b: DataFrame,
      // BY-NAME: evaluated once INSIDE the writer lock, so a family whose
      // committed-id read needs crash recovery first (IvfIndex.readIds
      // after a rebalance died mid-swap) can run that recovery in the
      // thunk without racing a live writer — constructing the frame
      // before the lock would throw on the missing mid-swap table and
      // the ingest could never self-heal
      committedIds: => DataFrame,
      idCol: String,
      tsCol: String,
      lateness: Long)(admit: DataFrame => Unit): Unit =
    graft.util.IndexLock.withLock(sp, indexDir, "ingest-batch") { try {
      val wm = IngestWatermark.read(sp, indexDir)
      val ts = col(tsCol).cast("long")
      // left join with a presence marker instead of a left_anti: same
      // shuffle, but the joined frame ALSO answers "is the batch empty",
      // "is the admitted set empty" and "max event time" in one agg
      val marked = b
        .join(committedIds.select(col("id").cast("long").as("__cid")),
          col(idCol).cast("long") === col("__cid"), "left")
        .localCheckpoint(eager = false)
      val isFresh = col("__cid").isNull
      sp.sparkContext.setJobDescription("graft ingest: lateness gate")
      val stats = marked.agg(
        count(lit(1)).as("n"),
        max(ts).as("max_ts"),
        count(when(isFresh && ts >= wm, 1)).as("n_admit"),
        count(when(isFresh && (ts.isNull || ts < wm), 1)).as("n_late"))
        .collect().head
      if (stats.getLong(0) > 0) {
        // NULL event time is unclassifiable — audited to late/ (ts NULL),
        // never admitted. A bare `ts < wm` / `ts >= wm` filter pair would
        // silently drop null-ts rows from BOTH channels. A batch with NO
        // late rows skips the (empty) audit write entirely — one fewer
        // job per on-time batch, and still exactly-once on replay: the
        // late verdict is deterministic in (batch, pre-batch watermark),
        // so a replay that computes zero late rows computed zero the
        // first time too — there is no stale partition to overwrite.
        if (stats.getLong(3) > 0) {
          sp.sparkContext.setJobDescription("graft ingest: late audit")
          // the FULL original row, not just (id, ts): a self-contained
          // audit channel is what makes [[lateRows]]-driven re-ingest
          // possible without replaying the upstream source — the price
          // is a payload-width write, bounded by the batch's late rows
          marked.filter(isFresh && (ts.isNull || ts < wm))
            .drop("__cid")
            .write.mode(SaveMode.Overwrite)
            .parquet(s"$outDir/late/batch=$batchId")
        }
        if (stats.getLong(2) > 0)
          admit(marked.filter(isFresh && ts >= wm).drop("__cid")
            .localCheckpoint(eager = false))
        if (!stats.isNullAt(1)) // an all-null-ts batch advances nothing
          IngestWatermark.write(sp, indexDir,
            math.max(wm, stats.getLong(1) - lateness))
      }
      // finally, not a trailing call: descriptions are session-global, so
      // a throw from the audit write / admit / watermark write would
      // otherwise label every later unrelated job "graft ingest: …"
    } finally sp.sparkContext.setJobDescription(null) }

  /** The late audit channel's full payload rows (every original batch
    * column; the `batch` partition key dropped) — the re-ingest surface
    * the gate's audit contract promises. Late rows carry event times
    * BELOW the index's watermark by definition, so feeding them back
    * through the gated path would route them straight back to `late/`;
    * the loop closes through the NON-gated ingest instead
    * ([[lexIngestOnce]] / [[dedupIngestOnce]] / the index `append`s),
    * whose freshness anti-join still dedups against committed state.
    * Empty (schema-less dirs included) → None, so callers distinguish
    * "no late rows ever" from an empty frame of unknown shape.
    */
  def lateRows(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$outDir/late")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      // a crash during the audit write can leave late/ holding only
      // _temporary debris — no committed files, no inferable schema;
      // that is "no late rows recoverable", not an operator-facing
      // crash. Decide by LISTING for committed parquet (non-hidden)
      // rather than catching AnalysisException wholesale: a blanket
      // catch would also convert genuine read failures (conflicting
      // schemas across late/batch=N partitions from mixed-version
      // runs) into "no late rows", silently dropping auditable data.
      val committed = new java.util.ArrayDeque[org.apache.hadoop.fs.Path]()
      committed.push(p)
      var found = false
      while (!found && !committed.isEmpty) {
        val dir = committed.pop()
        fs.listStatus(dir).foreach { st =>
          val n = st.getPath.getName
          if (!n.startsWith("_") && !n.startsWith(".")) {
            if (st.isDirectory) committed.push(st.getPath)
            else if (n.endsWith(".parquet")) found = true
          }
        }
      }
      if (!found) None
      else Some(spark.read.parquet(p.toString).drop("batch"))
    }
  }

  /** [[dedupIngestOnce]] with the same event-time lateness gate as
    * [[lexIngestWatermarked]] — late-arrival parity across the ingest
    * family: the gate is one engine-wide contract
    * ([[watermarkGatedBatch]]), not a per-operator behavior.
    *
    * Late rows (event time below the persisted watermark as of their
    * batch's start, or NULL) are dropped from the index — never probed,
    * never appended — and audited to `<outDir>/late` as (id, ts).
    * Candidate rows of admitted fresh docs land under `<outDir>/cands`
    * and are returned. End-state equivalence: the committed index equals
    * a one-shot [[graft.dedup.LshDedupIndex.build]] over base ∪ admitted
    * (signature state is per-document; append order cannot matter).
    */
  def dedupIngestWatermarked(
      spark: SparkSession,
      batchesDir: String,
      batchSchema: StructType,
      indexDir: String,
      outDir: String,
      idCol: String,
      textCol: String,
      tsCol: String,
      lateness: Long,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val nbMemo = new MetaMemo[(Int, Int, Int)]
    val fs = runFileBatches(spark, batchesDir, batchSchema, outDir,
        "graft_dedupwm_ckpt", maxFilesPerTrigger) { (b, batchId) =>
      dedupIngestBatch(b.sparkSession, indexDir, outDir, batchId,
        b, idCol, textCol, tsCol, lateness, nbMemo)
    }
    channelOrEmpty(spark, fs, s"$outDir/cands",
      graft.dedup.LshDedupIndex.candidateSchema, dropBatch = true)
  }

  /** One micro-batch of [[dedupIngestWatermarked]] — extracted for the
    * same crash-replay testability as [[lexIngestBatch]]; the cands
    * channel is batch-keyed (`cands/batch=<id>`, Overwrite).
    */
  private[graft] def dedupIngestBatch(
      sp: SparkSession,
      indexDir: String,
      outDir: String,
      batchId: Long,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      lateness: Long,
      nbMemo: MetaMemo[(Int, Int, Int)] = new MetaMemo[(Int, Int, Int)])
      : Unit = {
    // lazy checkpoints — see lexIngestBatch
    val b = batch.localCheckpoint(eager = false)
    // ONE signatures scan serves the gate's marker join and (via
    // preSigs) the probe's candidate fetch — the dedupIngestOnce shape
    // LAZY val + in-thunk recovery — see lexIngestBatch
    lazy val sigs = graft.dedup.LshDedupIndex.readSignatures(sp, indexDir)
      .localCheckpoint(eager = false)
    watermarkGatedBatch(sp, indexDir, outDir, batchId, b, {
        graft.dedup.LshDedupIndex.recoverCommit(sp, indexDir)
        sigs.select(col("id"))
      }, idCol, tsCol, lateness) { fresh =>
      // ONE MinHash kernel pass for the whole batch: the signed frame
      // feeds the probe (preSigned) AND the index append (appendSigned);
      // params are read once per LOOP (generation-keyed MetaMemo —
      // revalidated AFTER this batch's in-lock recovery ran) and shared
      // the same way
      val params @ (_, bands, rpb) = nbMemo.getOrLoad(
          graft.dedup.LshDedupIndex.metaGen(sp, indexDir))(
        graft.dedup.LshDedupIndex.loadParams(sp, indexDir))
      val signed = graft.dedup.LshDedupIndex
        .signBatch(fresh, idCol, textCol, params)
      sp.sparkContext.setJobDescription("graft ingest: probe")
      graft.dedup.LshDedupIndex
        .candidatesAgainst(sp, indexDir, fresh, idCol, textCol,
          preSigs = Some(sigs), preSigned = Some(signed),
          preParams = Some(params))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/cands/batch=$batchId")
      sp.sparkContext.setJobDescription("graft ingest: append")
      graft.dedup.LshDedupIndex.appendSigned(sp, indexDir, signed,
        bands, rpb, takeLock = false)
    }
  }

  /** Watermark-gated streaming VECTOR ingest into a persistent
    * [[graft.knn.IvfIndex]] — the third index family on the engine-wide
    * lateness contract ([[watermarkGatedBatch]]), completing ANN-serving
    * parity with the lexical ([[lexIngestWatermarked]]) and dedup
    * ([[dedupIngestWatermarked]]) paths. Each micro-batch of embeddings
    * is (1) freshness-filtered against the committed id set, (2) split
    * on event time against the persisted watermark — late/null-ts rows
    * are audited to `<outDir>/late`, never probed or appended — and
    * (3) for the admitted rows: probed against the index AS OF batch
    * start (serving results land batch-keyed under `<outDir>/search`,
    * exactly-once on crash replay) and appended into their inverted
    * lists. End-state equivalence: the committed assignments id set
    * equals base ∪ admitted, and a full probe (`nProbe = nList`) over
    * the committed index is exact — both closed-form oracle-checkable
    * from the staging arithmetic.
    *
    * Reference anchor: the reference builds its ANN index once and
    * serves lookups from it (DeepJoin/annIndex.py:42–51); continuous
    * index maintenance under event-time lateness is the at-scale
    * extension of that serving loop.
    */
  def annIngestWatermarked(
      spark: SparkSession,
      batchesDir: String,
      batchSchema: StructType,
      indexDir: String,
      outDir: String,
      idCol: String,
      vecCol: String,
      tsCol: String,
      lateness: Long,
      k: Int = 10,
      nProbe: Int = 4,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val metaMemo = new MetaMemo[(Array[Array[Float]], String,
      Option[(graft.knn.PqCodebooks, Boolean)])]
    val fs = runFileBatches(spark, batchesDir, batchSchema, outDir,
        "graft_annwm_ckpt", maxFilesPerTrigger) { (b, batchId) =>
      annIngestBatch(b.sparkSession, indexDir, outDir, batchId,
        b, idCol, vecCol, tsCol, lateness, k, nProbe, metaMemo)
    }
    channelOrEmpty(spark, fs, s"$outDir/search",
      graft.knn.IvfIndex.searchSchema, dropBatch = true)
  }

  /** One micro-batch of [[annIngestWatermarked]] — extracted for the
    * same crash-replay testability as [[lexIngestBatch]]; the search
    * channel is batch-keyed (`search/batch=<id>`, Overwrite).
    */
  private[graft] def annIngestBatch(
      sp: SparkSession,
      indexDir: String,
      outDir: String,
      batchId: Long,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      tsCol: String,
      lateness: Long,
      k: Int,
      nProbe: Int,
      metaMemo: MetaMemo[(Array[Array[Float]], String,
        Option[(graft.knn.PqCodebooks, Boolean)])] =
        new MetaMemo[(Array[Array[Float]], String,
          Option[(graft.knn.PqCodebooks, Boolean)])]): Unit = {
    // lazy checkpoints — see lexIngestBatch
    val b = batch.localCheckpoint(eager = false)
    watermarkGatedBatch(sp, indexDir, outDir, batchId, b, {
        // the committed-id thunk runs INSIDE the writer lock: resolve any
        // crashed-rebalance swap FIRST — a rebalance that died between
        // its table renames leaves no live assignments dir, and reading
        // it before recovery would throw on every replay, bricking the
        // ingest instead of healing the index
        graft.knn.IvfIndex.recoverSwap(sp, indexDir)
        graft.knn.IvfIndex.readIds(sp, indexDir)
          .localCheckpoint(eager = false)
      }, idCol, tsCol, lateness) { fresh =>
      // ONE metadata load per LOOP (generation-keyed MetaMemo —
      // centroids/metric/PQ are append-immutable, but a rebalance can
      // commit or be crash-recovered by THIS batch's thunk between
      // batches, so the memo revalidates against the commit fingerprint
      // read here, AFTER that recovery ran, and a swapped quantizer
      // forces a reload instead of filing vectors into replaced lists)
      // serves both the probe (preMeta) and the append (appendPrepared)
      val (centroids, metric, pq) = metaMemo.getOrLoad(
          graft.knn.IvfIndex.metaGen(sp, indexDir))(
        graft.knn.IvfIndex.loadIndexMeta(sp, indexDir))
      sp.sparkContext.setJobDescription("graft ingest: probe")
      // probe against the index AS OF batch start (fresh ids are not yet
      // members, so excludeSelf has nothing to exclude — kept for the
      // re-ingest-own-output case where it does)
      graft.knn.IvfIndex.search(sp, indexDir, fresh, idCol, vecCol, k,
          nProbe, preMeta = Some((centroids, metric)))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/search/batch=$batchId")
      sp.sparkContext.setJobDescription("graft ingest: append")
      graft.knn.IvfIndex.appendPrepared(sp, indexDir, fresh, idCol, vecCol,
        centroids, metric, pq)
    }
  }

  /** [[annIngestWatermarked]]'s contract on the sharded
    * [[graft.knn.HnswIndex]] — the FOURTH index family under the one
    * engine-wide lateness gate. Per micro-batch: freshness marker-join
    * against the live manifest's id set, late/null-ts rows audited
    * batch-keyed, admitted vectors beam-probed against the graph AS OF
    * batch start (`search/batch=<id>`, exactly-once on replay) and then
    * inserted into their shards' graphs via the generation-committed
    * append (whose manifest rename is the batch's index commit — a crash
    * before it leaves only unreferenced g=N+1 debris, and the replayed
    * batch still sees its docs as fresh).
    *
    * The committed-id end state (base ∪ admitted) and the late split are
    * EXACT regardless of graph quality — only the search channel is
    * approximate (HNSW recall), which is why the oracle pins membership
    * and lateness, not neighbor sets.
    */
  def hnswIngestWatermarked(
      spark: SparkSession,
      batchesDir: String,
      batchSchema: StructType,
      indexDir: String,
      outDir: String,
      idCol: String,
      vecCol: String,
      tsCol: String,
      lateness: Long,
      k: Int = 10,
      efSearch: Int = 64,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    // one params read per LOOP (generation-keyed MetaMemo — a reshard/
    // rebuild committing between batches swaps params and forces a
    // reload), shared by every batch's probe and append — the family
    // pattern the other three ingesters already run
    val paramsMemo = new MetaMemo[graft.knn.HnswIndex.Params]
    val fs = runFileBatches(spark, batchesDir, batchSchema, outDir,
        "graft_hnswwm_ckpt", maxFilesPerTrigger) { (b, batchId) =>
      hnswIngestBatch(b.sparkSession, indexDir, outDir, batchId,
        b, idCol, vecCol, tsCol, lateness, k, efSearch, paramsMemo)
    }
    channelOrEmpty(spark, fs, s"$outDir/search",
      graft.knn.IvfIndex.searchSchema, dropBatch = true) // engine kNN shape
  }

  /** One micro-batch of [[hnswIngestWatermarked]] — extracted for the
    * same crash-replay testability as [[annIngestBatch]].
    */
  private[graft] def hnswIngestBatch(
      sp: SparkSession,
      indexDir: String,
      outDir: String,
      batchId: Long,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      tsCol: String,
      lateness: Long,
      k: Int,
      efSearch: Int,
      paramsMemo: MetaMemo[graft.knn.HnswIndex.Params] =
        new MetaMemo[graft.knn.HnswIndex.Params]): Unit = {
    // lazy checkpoints — see lexIngestBatch
    val b = batch.localCheckpoint(eager = false)
    watermarkGatedBatch(sp, indexDir, outDir, batchId, b, {
        // the committed-id thunk runs INSIDE the writer lock (readIds
        // reads the manifest eagerly — captured before the lock, a
        // concurrent append/vacuum committing in between would make
        // already-committed ids look fresh or pin the scan to deleted
        // generation dirs; same contract as annIngestBatch). A reshard
        // that died mid-swap heals here first, like the IVF recoverSwap
        graft.knn.HnswIndex.recoverReshard(sp, indexDir)
        graft.knn.HnswIndex.readIds(sp, indexDir)
          .localCheckpoint(eager = false)
      }, idCol, tsCol, lateness) { fresh =>
      // ONE params load per LOOP (generation-keyed memo, revalidated
      // against the commit fingerprint AFTER this batch's in-lock
      // recovery ran), shared by the probe and the append; the append
      // skips the guards the gate just established (freshness via the
      // marker join; within-batch uniqueness is the input contract) —
      // the annIngestBatch/lexIngestBatch fast path, two fewer jobs per
      // batch
      val params = paramsMemo.getOrLoad(
          graft.knn.HnswIndex.metaGen(sp, indexDir))(
        graft.knn.HnswIndex.loadParams(sp, indexDir))
      sp.sparkContext.setJobDescription("graft ingest: probe")
      graft.knn.HnswIndex.search(sp, indexDir, fresh, idCol, vecCol, k,
          efSearch, preParams = Some(params))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/search/batch=$batchId")
      sp.sparkContext.setJobDescription("graft ingest: append")
      graft.knn.HnswIndex.append(sp, indexDir, fresh, idCol, vecCol,
        takeLock = false, checkBatchUnique = false, checkPresence = false,
        preParams = Some(params))
    }
  }

  /** Streaming exact dedup, EXECUTED: the events file is staged TWICE
    * into the source directory, so every event genuinely arrives as a
    * duplicate; `dropDuplicatesWithinWatermark` on the key keeps the
    * first arrival, and the drained Append-mode sink must equal the
    * ORIGINAL table row-for-row — a batch-oracle-checkable execution of
    * the streaming dedup state machine.
    */
  def dedupEventsOnce(spark: SparkSession, eventsPath: String,
      delay: String = "2 hours"): DataFrame = {
    val f = new java.io.File(eventsPath)
    require(f.isFile, s"dedupEventsOnce: not a file: $eventsPath")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dup")
    graft.util.TempDirs.register(dir.toString)
    Seq("dup_a.parquet", "dup_b.parquet").foreach(stageFile(dir, _, f))
    drainToMemorySink(spark,
      dedupStream(eventsStream(spark, dir.toString), Seq("event_id"),
        delay = delay),
      OutputMode.Append())
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionAgg(user_id: Long, session_start_us: Long,
      n_events: Long, sum_value: Double)

  // must be public: Spark's generated state-encoder code instantiates and
  // reads this class reflectively from outside the enclosing object
  final case class SessionState(startUs: Long, lastUs: Long, cnt: Long, total: Double)

  /** Gap-based sessionization, BATCH form: a new session starts when the
    * gap to the previous event of the same user exceeds `gapMinutes`.
    * Window-function formulation — one shuffle by user, no state.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val us = unix_micros(col("ts"))
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .withColumn("__prev", lag(us, 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull || us - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("__session_no",
        sum("__new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "__session_no")
      .agg(min(us).as("session_start_us"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select("user_id", "session_start_us", "n_events", "sum_value")
  }

  /** Streaming exact dedup: `dropDuplicatesWithinWatermark` over the key
    * columns — the streaming twin of the batch exact-dedup canonicalization
    * (dedup/Dedup.exactDupGroups). State is bounded by the watermark: a
    * duplicate arriving within the delay is dropped, and the key's state is
    * evicted once the watermark passes — the only dedup contract that holds
    * on an unbounded stream without an external store.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkCol: String = "ts", delay: String = "1 hour"): DataFrame =
    events.withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Gap-based sessionization, STREAMING form: custom state machine via
    * flatMapGroupsWithState — emits a session when the gap closes it (same
    * session boundaries as the batch twin for in-order input).
    * `flushTimeout=true` adds a processing-time timeout so idle sessions
    * eventually flush in production; leave it off for deterministic
    * drain-and-stop tests (timeout batches otherwise keep the query busy
    * forever).
    */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30,
      flushTimeout: Boolean = false): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (flushTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        sessionUpdate(gapMinutes, flushTimeout))
  }

  /** The sessionization state machine (extracted so the timeout path is
    * unit-testable with `TestGroupState` — a ProcessingTimeTimeout query
    * never drains under `processAllAvailable`).
    */
  private[graft] def sessionUpdate(gapMinutes: Int, flushTimeout: Boolean)(
      userId: Long, evs: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionAgg] = {
    val gapUs = gapMinutes.toLong * 60 * 1000000
    // processing-time timeout fired with no new events: flush the idle
    // session and clear state — otherwise the timeout would be re-armed
    // below and the session would never be emitted
    if (state.hasTimedOut) {
      val flushed = state.getOption.map(s =>
        SessionAgg(userId, s.startUs, s.cnt, math.rint(s.total * 100) / 100))
      state.remove()
      return flushed.iterator
    }
    var out = List.empty[SessionAgg]
    var cur = state.getOption
    // MICROsecond event time, like the batch twin's unix_micros: getTime
    // alone truncates to ms (java.sql.Timestamp carries sub-ms in nanos),
    // and a 10:00:00.000500 event would sessionize differently in the
    // two twins, breaking the row-for-row boundary contract
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
    evs.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
      val us = micros(e.ts)
      cur match {
        case Some(s) if us - s.lastUs <= gapUs =>
          cur = Some(s.copy(lastUs = us, cnt = s.cnt + 1, total = s.total + e.value))
        case Some(s) =>
          out ::= SessionAgg(userId, s.startUs, s.cnt,
            math.rint(s.total * 100) / 100)
          cur = Some(SessionState(us, us, 1, e.value))
        case None =>
          cur = Some(SessionState(us, us, 1, e.value))
      }
    }
    cur.foreach(s => state.update(s))
    if (flushTimeout) state.setTimeoutDuration(s"$gapMinutes minutes")
    out.reverseIterator
  }
}
