package graft.text

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent BM25 inverted index — the incremental-corpus counterpart of
  * the one-shot [[Bm25.scoreTopK]] (which re-derives the whole index per
  * run; serving lexical retrieval over a 100 TB corpus must not).
  * Index-as-data layout in the [[graft.knn.IvfIndex]] /
  * [[graft.dedup.LshDedupIndex]] family (reference analogue: none — the
  * reference keeps no corpus state at all, SURVEY.md §7.4):
  *
  *  - `postings/` — (term, id, tf) parquet PARTITIONED BY `bucket` =
  *    pmod(xxhash64(term), nBuckets): the inverted index. ALL postings of
  *    a term live in that term's bucket, so a probe reads only the
  *    buckets its query terms hash to (directory-pruned at file-listing
  *    level) and per-term document frequencies counted inside a pruned
  *    read are complete;
  *  - `doclens/` — (id, dl): one row per token-bearing document. Doubles
  *    as the corpus-statistics source: N and avgdl are a 1-row
  *    aggregation over this narrow table at probe time, so they are
  *    always consistent with the committed corpus — no separately
  *    maintained stats row to drift;
  *  - `params/` — one row (n_buckets): the partitioning scheme. Probe
  *    and append read it from the index — a caller cannot mismatch the
  *    build.
  *
  * Write ORDER is the append crash-safety protocol (the LshDedupIndex
  * convention): postings stage FIRST, the doclens write is the commit
  * point. A document is "in the index" iff its doclens row exists —
  * [[searchTopK]]'s inner dl join makes orphaned postings (a crash
  * between the two writes) invisible as candidates, and [[append]]'s
  * already-present check reads doclens, so retrying the crashed append
  * re-stages the batch and commits. Re-staged duplicate postings are
  * collapsed at probe time (max over identical rows) and reclaimed by
  * [[vacuum]]. One probe-visible transient: per-term df counts from a
  * pruned read include orphaned postings of an UNretried crashed append
  * until [[vacuum]] reclaims them — a bounded score perturbation (df
  * over-count ≤ the crashed batch), never a phantom result row.
  */
object Bm25Index {

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
    Seq(Tuple1(nBuckets)).toDF("n_buckets")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/params")
    writeState(docs, idCol, textCol, dir, nBuckets, SaveMode.Overwrite)
  }

  /** Tokenize + write shared by [[build]] and [[append]]: ONE explode +
    * groupBy pass over the batch produces the (id, term, tf) frame
    * (lazy-localCheckpoint-ed — it feeds the postings write, the doclens
    * write, and the returned count), then the two writes in commit order.
    */
  private def writeState(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      nBuckets: Int,
      mode: SaveMode): Long = {
    val tf = docs.select(col(idCol).cast("long").as("id"),
        explode(split(trim(lower(coalesce(col(textCol), lit("")))), "\\s+"))
          .as("term"))
      .filter(col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    tf.withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode(mode)
      .partitionBy("bucket")
      .parquet(s"$dir/postings")
    // commit point (see the write-order doc above)
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
      .localCheckpoint(eager = false)
    dl.write.mode(mode).parquet(s"$dir/doclens")
    dl.count()
  }

  private def loadParams(spark: SparkSession, dir: String): Int = {
    val rows = spark.read.parquet(s"$dir/params").select("n_buckets").collect()
    require(rows.length == 1, s"Bm25Index: malformed params under $dir")
    rows.head.getInt(0)
  }

  /** Add a new batch WITHOUT touching existing state: one tokenize pass,
    * parquet-appended into the bucket partitions and `doclens/`. Ids must
    * be unique corpus-wide. Blank documents index nothing (the
    * [[Bm25.scoreTopK]] convention — they can never match a term) and do
    * not count toward the returned appended-row count.
    */
  def append(
      spark: SparkSession,
      dir: String,
      newDocs: DataFrame,
      idCol: String,
      textCol: String): Long = {
    val nBuckets = loadParams(spark, dir)
    val ids = newDocs.select(col(idCol).cast("long").as("id"))
    require(ids.groupBy("id").count().filter(col("count") > 1).isEmpty,
      "Bm25Index.append: duplicate ids within the appended batch")
    require(spark.read.parquet(s"$dir/doclens").select("id")
      .join(ids, "id").isEmpty,
      "Bm25Index.append: id already present in the index")
    writeState(newDocs, idCol, textCol, dir, nBuckets, SaveMode.Append)
  }

  /** BM25 top-k retrieval AGAINST THE INDEXED CORPUS — exactly
    * [[Bm25.scoreTopK]]'s contract and output (query_id, id, score, rnk),
    * computed from persisted state: identical formula, identical 4-dp
    * round-before-rank tie rule, N/avgdl from `doclens/`. A probe of an
    * index built from `docs` equals `scoreTopK(docs, …)` row for row.
    *
    * Probe cost: the query batch's distinct terms hash to a bucket set
    * (collected driver-side — bounded by the query batch, the
    * IvfIndex probed-cid convention), and only those partition
    * directories are listed and scanned. Per-term df is counted inside
    * the pruned read (complete — a term's postings never span buckets);
    * the dl join ships candidate-sized hits against the narrow doclens
    * table; the ranking window partitions per query.
    */
  def searchTopK(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      qIdCol: String,
      qTextCol: String,
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val nBuckets = loadParams(spark, dir)
    require(topK > 0, s"searchTopK: topK must be positive, got $topK")
    require(k1 >= 0 && b >= 0 && b <= 1, s"searchTopK: bad k1/b ($k1, $b)")
    val qterms = queries.select(col(qIdCol).cast("long").as("query_id"),
        explode(array_distinct(
          split(trim(lower(coalesce(col(qTextCol), lit("")))), "\\s+")))
          .as("term"))
      .filter(col("term") =!= "")
      .localCheckpoint(eager = false)
    // bounded driver collect: one bucket id per distinct query term, the
    // static partition filter that prunes the postings listing
    val buckets = qterms
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("bucket"))
      .distinct().collect().map(_.getLong(0))
    if (buckets.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], searchSchema)
    val pruned = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*))
      .select(col("term"), col("id"), col("tf"))
      // a retried crashed append stages its postings TWICE before the
      // single doclens commit — collapse here so no score ever double-
      // counts (the probe-side analogue of LshDedupIndex's pair-level
      // dropDuplicates); the staged rows are identical, so max == tf
      .groupBy("term", "id").agg(max("tf").as("tf"))
      .localCheckpoint(eager = false)
    val dfreq = pruned.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = spark.read.parquet(s"$dir/doclens")
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg("dl").as("avgdl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("score"), asc("id"))
    pruned.join(dfreq, "term")
      .join(broadcast(qterms), "term")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) /
            (col("df") + 0.5)) *
          (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("contrib"))
      .groupBy("query_id", "id")
      .agg(round(sum("contrib"), 4).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select("query_id", "id", "score", "rnk")
  }

  /** The output schema of [[searchTopK]] — the empty-probe constant, the
    * [[graft.knn.IvfIndex.searchSchema]] convention.
    */
  val searchSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("rnk",
        org.apache.spark.sql.types.IntegerType, nullable = false)))

  /** Bucket-level occupancy: (bucket, n_rows, n_terms, max_term_rows) —
    * the [[graft.dedup.LshDedupIndex.stats]] family. Probe cost follows
    * the hottest bucket a query hashes into; a bucket whose term count
    * collapses relative to the others signals a degenerate hash or a
    * stopword-dominated corpus (raise nBuckets, or stoplist upstream).
    */
  def stats(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/postings")
      .groupBy("bucket", "term").agg(count(lit(1)).as("__t"))
      .groupBy("bucket")
      .agg(sum("__t").cast("long").as("n_rows"),
        count(lit(1)).as("n_terms"),
        max("__t").cast("long").as("max_term_rows"))

  /** Maintenance: reclaim orphaned postings (a crashed append's debris —
    * rows whose id has no doclens row), collapse duplicate postings from
    * a retried append (identical (id, term, tf) rows staged twice
    * collapse to one; doclens rows, written once at commit, are never
    * duplicated), and
    * compact small files. Rewrite-then-swap with on-entry crash recovery —
    * the [[graft.dedup.LshDedupIndex.vacuum]] contract verbatim. Probe
    * results are unchanged by construction: orphans were invisible,
    * duplicate postings only existed alongside their not-yet-committed
    * doclens rows. Returns the number of postings rows reclaimed
    * (orphans + collapsed duplicates).
    */
  def vacuum(spark: SparkSession, dir: String, doclenFiles: Int = 0): Long = {
    val nBuckets = loadParams(spark, dir)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

    def recover(table: String): Unit = {
      val live = new Path(s"$dir/$table")
      val old = new Path(s"$dir/$table.old")
      val tmp = new Path(s"$dir/$table.tmp")
      if (!fs.exists(live) && fs.exists(old))
        require(fs.rename(old, live), s"Bm25Index.vacuum: could not restore $old")
      else if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(tmp)) fs.delete(tmp, true)
    }
    recover("postings")
    recover("doclens")

    val dl = spark.read.parquet(s"$dir/doclens")
    val postings = spark.read.parquet(s"$dir/postings")
      .select("term", "id", "tf")
    val live = postings
      .join(dl.select("id"), Seq("id"), "left_semi")
      // duplicates from a retried append are IDENTICAL rows (same batch,
      // same tokenize) — max collapses them to the original tf; sum
      // would double-count
      .groupBy("id", "term").agg(max("tf").as("tf"))
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
