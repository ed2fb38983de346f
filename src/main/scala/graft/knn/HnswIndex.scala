package graft.knn

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent sharded HNSW index — the graph-ANN counterpart of
  * [[IvfIndex]]'s index-as-data layout (reference: hnswlib
  * `save_index`/`load_index`, DeepJoin/annIndex.py:42–51, a single-machine
  * byte blob; here the graph state IS a table):
  *
  *  - `nodes/g=<gen>/shard=<s>/` — one parquet row per graph node:
  *    (g, shard, pos, id, vec, links: array<array<int>>), `pos` the
  *    insertion position within its shard, links holding neighbor
  *    positions per level. Generation directories are IMMUTABLE once
  *    written — append never rewrites a live file;
  *  - `manifest/m<gen>.json` — the commit marker: which generation is
  *    live for each shard. Written whole to a temp name then renamed
  *    (atomic on HDFS/local), and readers take the highest-numbered
  *    manifest — so a crash anywhere in append leaves the previous
  *    manifest pointing at fully-intact state, and orphaned
  *    new-generation files are simply never referenced;
  *  - `params/` — one row (m, metric, shards, ef_construction,
  *    ef_search, rc_median, rc_q25): the hyperparameters the graphs
  *    were built under, the intended serving beam, and — when an
  *    untuned [[build]] resolved that beam from the catalog's measured
  *    shape (the SERVING BEAM contract on [[build]]) — the relative-
  *    contrast evidence behind the choice. Search reads them from the
  *    index itself — a caller cannot mismatch the build, and an
  *    untuned [[search]] serves the beam the builder declared
  *    (pre-column legacy layouts read as the engine-wide default 64,
  *    which is what they were always served at, with null evidence).
  *
  * Shard assignment is a deterministic hash of the id (stable across
  * builds and loads, independent of input partitioning), and insertion
  * order within a shard is ascending HASH-of-id (a seeded chain distinct
  * from the shard hash — see [[shardGraphFrame]] for the measured reason
  * arrival must be decorrelated from raw id order) — so the persisted
  * index is byte-deterministic for a given dataset. Search restores each shard's
  * graph EXACTLY ([[HnswGraph.restore]] — adjacency, entry point, top
  * level) and runs the same [[HnswSearch]] broadcast-query beam as
  * [[ApproxKnn.hnswKnn]]; a restored index answers identically to the
  * index that was saved.
  */
object HnswIndex {

  /** Build the per-shard graphs and persist them as node rows. Returns
    * the node count written.
    *
    * Rebuild-in-place over a live index is GENERATION-STAGED and atomic:
    * the new corpus's graphs land in the next generation directory (no
    * live file touched), params swap and the manifest commit under the
    * [[reshard]] marker protocol, and only then are the superseded
    * generations deleted. A crash at any earlier point leaves the
    * previous index fully live (readers keep resolving the old
    * manifest); recovery at the next writer entry rolls the commit
    * forward or back. Only a manifest-less directory takes the direct
    * fresh-build path. Like [[append]], build assumes a single writer
    * per index directory — ENFORCED by [[graft.util.IndexLock]]
    * (create-exclusive `_writer.lock`, stale-TTL broken): a second
    * maintenance writer fails fast with `HeldByOther` instead of racing
    * a swap or interleaving generations.
    *
    * SERVING BEAM: an untuned build (`efSearch` left at
    * [[UseIndexDefault]]) resolves the persisted `ef_search` from the
    * catalog's own measured SHAPE — the same maturation the grid's
    * escalation gate took in r19 ([[graft.pipeline.SemLinkGrid]]):
    * past [[ShapeProbeAbove]] nodes, one
    * [[ShapeStats.relativeContrastStats]] pass over the just-written
    * node rows (the exact corpus the index will serve; no re-read of
    * the caller's upstream lineage) classifies the catalog, and a
    * spread shape (q25 ≤ [[ShapeStats.SpreadRcMax]]) gets the measured
    * [[BeamLaw.SpreadBaseEf]] while a clustered one keeps
    * [[DefaultServeEf]] — the beam the recall matrix measured for each
    * regime (BeamLaw's ladder;
    * SCALE_r19_hnsw_index_shape_{spread,clustered}.json are the
    * END-TO-END artifacts on this path). The decision and its evidence
    * persist beside the params (`rc_median`/`rc_q25`, null when never
    * measured) and surface in [[staleness]]. An EXPLICIT `efSearch` —
    * any value, including the ≤ 0 full-beam sentinel — skips the probe
    * entirely and persists verbatim; below [[ShapeProbeAbove]] the
    * default stays [[DefaultServeEf]] unprobed (the measured matrix's
    * first tier is 2·10⁵ — at spec scale a 64 beam over shard-local
    * graphs is effectively wide and the probe's full-catalog pass
    * would be pure overhead). Appends never re-measure: shape is a
    * BUILD/REBUILD-time decision, like the IVF family's displacement
    * anchor — a corpus whose shape drifts re-classifies at its next
    * rebuild.
    *
    * SHARD COUNT: the untuned default (`shards` left at
    * [[UseAutoShards]]) is SIZE-AWARE — [[resolveShards]] holds the
    * per-shard graph at or under [[TargetShardNodes]] (~31k) nodes,
    * the per-shard size every committed recall anchor was measured at
    * (the grid tier runs 32 shards, so its 10⁶-key rows ARE ~31k-node
    * graphs). Recall tracks the beam's coverage of the PER-SHARD
    * graph, not the corpus: the same law'd beam measured 0.9949/0.9578
    * (clustered/spread at 10⁶, 31k shards) but only 0.9037/0.6476 when
    * a fixed 16-shard default let shards grow to 62.5k nodes
    * (SCALE_r19_hnsw_index_shape_*_16shards.json — the measurement
    * that forced this default). An explicit `shards` persists
    * verbatim, as before; resolution costs one count of the candidate
    * side on the auto path only.
    */
  def build(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      m: Int = 16,
      efConstruction: Int = 100,
      metric: String = KnnJoin.MetricL2Sq,
      shards: Int = UseAutoShards,
      seed: Int = 42,
      efSearch: Int = UseIndexDefault,
      shapeProbeAbove: Long = ShapeProbeAbove): Long =
    // same single-writer lock as append/vacuum: a build racing a live
    // append would clear manifests and Overwrite nodes/ the append is
    // mid-commit on, silently losing the append's generation
    graft.util.IndexLock.withLock(candidates.sparkSession, dir,
        "HnswIndex.build") {
      buildLocked(candidates, idCol, vecCol, dir, m, efConstruction, metric,
        shards, seed, efSearch, shapeProbeAbove)
    }

  /** The untuned serving beam on a catalog the shape probe did not (or
    * could not) classify — the engine-wide HNSW default every measured
    * clustered-shape row was taken at.
    */
  val DefaultServeEf: Int = 64

  /** Corpus size below which an untuned [[build]] skips the shape probe
    * and keeps [[DefaultServeEf]]. Aligned with the grid's ANN tier
    * ([[graft.pipeline.SemLinkGrid.DefaultHnswAbove]]) and the measured
    * recall matrix, whose first tier is 2·10⁵: below this the beam
    * choice has no measured recall gap to buy, and the probe's
    * full-catalog nearest-neighbor pass would be the build's single
    * most expensive step instead of noise against graph construction.
    */
  val ShapeProbeAbove: Long = 100000L

  /** [[build]]'s "size the shards for me" sentinel (see the SHARD COUNT
    * contract on its scaladoc).
    */
  val UseAutoShards: Int = 0

  /** The per-shard node ceiling [[resolveShards]] maintains on the auto
    * path: 10⁶ keys over the grid tier's 32 shards — the per-shard
    * graph size behind every committed 10⁶-tier recall row. Larger
    * shards shed measured recall at the law'd beam (62.5k-node shards:
    * 0.9037 clustered / 0.6476 spread vs 0.9949/0.9578 at this
    * ceiling — SCALE_r19_hnsw_index_shape_*_16shards.json); smaller
    * shards only add merge fan-in.
    *
    * Interaction with [[BeamLaw]]: the law keys on TOTAL corpus size,
    * measured on the grid's fixed 32 shards where per-shard graphs
    * grow with the corpus. On the auto path per-shard size saturates
    * at this ceiling instead, so past 10⁶ keys the law's further
    * doublings are CONSERVATIVE (per-shard beam coverage no longer
    * shrinks; extra shards only add independent chances to surface the
    * true neighbor) — quality-safe by construction, unmeasured beyond
    * the 10⁶ anchors, and the compute-minded operator's knob is an
    * explicit `efSearch` with the law's autoscale off.
    */
  val TargetShardNodes: Long = 31250L

  /** The floor (and the pre-r19 fixed default) for the auto path —
    * spec-scale corpora resolve here, bit-identical to the old
    * default.
    */
  val DefaultShards: Int = 16

  /** [[build]]'s shard-count resolution, a pure function for direct
    * spec pinning: explicit counts pass through verbatim; the
    * [[UseAutoShards]] sentinel resolves to the smallest count that
    * holds per-shard size at or under [[TargetShardNodes]], floored at
    * [[DefaultShards]].
    */
  private[graft] def resolveShards(shards: Int, n: Long): Int = {
    require(shards >= 0,
      s"HnswIndex: shards must be positive (or the UseAutoShards " +
        s"sentinel 0), got $shards")
    if (shards != UseAutoShards) shards
    else math.max(DefaultShards.toLong,
      (n + TargetShardNodes - 1) / TargetShardNodes).toInt
  }

  private def buildLocked(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      m: Int,
      efConstruction: Int,
      metric: String,
      shards: Int,
      seed: Int,
      efSearch: Int,
      shapeProbeAbove: Long): Long = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val cosine = HnswSearch.isCosine(metric)
    // fail BEFORE the destructive steps: past this point the previous
    // index's manifest is gone, and an empty corpus would then die on
    // nodes/ schema inference with the directory unreadable. Empty-seed
    // bootstrap is not supported here (unlike LshDedupIndex/Bm25Index,
    // whose explicit on-read schemas exist for the streaming
    // create-on-first-batch path); seed with at least one vector.
    // On the auto-shard path the emptiness check rides the shard-sizing
    // count (count == 0 ⟺ empty) — one pass over the candidate lineage
    // instead of two; the explicit-shard path keeps the cheaper
    // isEmpty (a single-partition take, no full count)
    val nAuto: Option[Long] =
      if (shards == UseAutoShards) Some(candidates.count()) else None
    require(nAuto.map(_ > 0L).getOrElse(!candidates.isEmpty),
      s"HnswIndex.build: empty candidate side for $dir — the previous " +
        "index (if any) is untouched")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // heal an interrupted reshard/rebuild against the CURRENT manifest
    // state before deciding which path this build takes
    recoverReshardLocked(spark, fs, dir)
    val src = candidates
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
    // size-aware shard count (the SHARD COUNT contract on [[build]]):
    // the count job is paid on the auto path only — an explicit count
    // passes through without touching the data
    val nShards = resolveShards(shards, nAuto.getOrElse(0L))
    val liveState =
      try Some(readManifest(spark, dir))
      catch { case _: IllegalArgumentException => None }

    liveState match {
      case Some((gen, oldShards, _)) =>
        // rebuild OVER A LIVE INDEX: generation-staged, reshard-protocol
        // commit — the previous index stays fully live until the new
        // manifest lands, and a crash at any point rolls back to it
        val newGen = gen + 1
        // anything under g=newGen is debris from a crashed attempt
        fs.delete(new Path(s"$dir/nodes/g=$newGen"), true)
        shardGraphFrame(src, m, efConstruction, cosine, seed, nShards, newGen)
          .write.mode(SaveMode.Append)
          .partitionBy("g", "shard")
          .parquet(s"$dir/nodes")
        // count (and, on the untuned path, shape-probe) the WRITTEN
        // rows before staging params — the serving beam is resolved
        // from the corpus the index will actually serve
        val written = spark.read.option("basePath", s"$dir/nodes")
          .parquet(s"$dir/nodes/g=$newGen")
        val byShard = written
          .groupBy("shard").count().as[(Int, Long)].collect()
        val (efResolved, rcMed, rcQ25) = resolveServeEf(
          written, byShard.map(_._2).sum, efSearch, shapeProbeAbove)
        paramsDf(spark, m, metric, nShards, efConstruction, seed, efResolved,
            rcMed, rcQ25)
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/params.tmp")
        // the `build:` prefix tells roll-forward recovery to ALSO clear
        // ingest state — a fresh corpus must not inherit the previous
        // corpus's high-water mark (reshard keeps the corpus and must
        // keep the watermark)
        // atomic publish (temp + rename): a torn marker would fail every
        // later writer entry's target parse
        graft.util.StagedTables.writeMarker(fs, dir, ReshardMarker,
          s"build:$newGen")
        val live = new Path(s"$dir/params")
        val old = new Path(s"$dir/params.old")
        val tmp = new Path(s"$dir/params.tmp")
        require(fs.rename(live, old), s"HnswIndex.build: could not stage $live")
        require(fs.rename(tmp, live), s"HnswIndex.build: could not commit $tmp")
        writeManifest(spark, dir, newGen, byShard.map(_._1 -> newGen).toMap,
          byShard.toMap)
        graft.util.IngestState.clear(spark, dir)
        fs.delete(old, true)
        fs.delete(new Path(s"$dir/$ReshardMarker"), false)
        // superseded generations are garbage once the manifest committed;
        // best-effort (a failure leaves orphans for vacuum, never an
        // inconsistent index)
        oldShards.foreach { case (s, g) =>
          try fs.delete(new Path(s"$dir/nodes/g=$g/shard=$s"), true)
          catch { case scala.util.control.NonFatal(_) => }
        }
        // a rebuild supersedes EVERY old shard, so their generation
        // parents empty out — sweep them too (vacuum would otherwise)
        oldShards.values.toSet.filter(_ != newGen).foreach { g =>
          try {
            val gd = new Path(s"$dir/nodes/g=$g")
            if (fs.exists(gd) && fs.listStatus(gd).isEmpty)
              fs.delete(gd, true)
          } catch { case scala.util.control.NonFatal(_) => }
        }
        byShard.map(_._2).sum

      case None =>
        // FRESH directory (no committed manifest — nothing to preserve):
        // direct write, the m000000 manifest is the commit point
        graft.util.IngestState.clear(spark, dir)
        val mdir = new Path(s"$dir/manifest")
        if (fs.exists(mdir)) fs.delete(mdir, true) // .inprogress debris
        shardGraphFrame(src, m, efConstruction, cosine, seed, nShards, 0)
          .write.mode(SaveMode.Overwrite)
          .partitionBy("g", "shard") // immutable generation dirs; the
          .parquet(s"$dir/nodes")    // manifest below is the commit point
        val written = spark.read.parquet(s"$dir/nodes")
        val byShard = written
          .groupBy("shard").count().as[(Int, Long)].collect()
        val (efResolved, rcMed, rcQ25) = resolveServeEf(
          written, byShard.map(_._2).sum, efSearch, shapeProbeAbove)
        paramsDf(spark, m, metric, nShards, efConstruction, seed, efResolved,
            rcMed, rcQ25)
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/params")
        writeManifest(spark, dir, 0, byShard.map(_._1 -> 0).toMap,
          byShard.toMap)
        byShard.map(_._2).sum
    }
  }

  /** [[build]]'s serving-beam resolution (the SERVING BEAM contract on
    * its scaladoc): explicit beams persist verbatim and below-threshold
    * untuned builds keep [[DefaultServeEf]] — both unprobed (rc null);
    * an untuned build past `shapeProbeAbove` pays one
    * [[ShapeStats.relativeContrastStats]] pass over the just-written
    * node rows and takes the measured beam for the classified shape.
    */
  private def resolveServeEf(written: DataFrame, n: Long, efSearch: Int,
      shapeProbeAbove: Long): (Int, Option[Double], Option[Double]) =
    if (efSearch != UseIndexDefault) (efSearch, None, None)
    else if (n < shapeProbeAbove) (DefaultServeEf, None, None)
    else {
      val rc = ShapeStats.relativeContrastStats(written, "id", "vec")
      val ef = if (rc.q25 <= ShapeStats.SpreadRcMax) BeamLaw.SpreadBaseEf
        else DefaultServeEf
      (ef, Some(rc.median), Some(rc.q25))
    }

  /** The one-row params frame — single author for the column list so
    * build's two paths and [[reshard]] cannot drift. `rc_median`/`rc_q25`
    * are the shape probe's evidence, null when the beam was explicit,
    * below-threshold, or pre-column legacy.
    */
  private def paramsDf(spark: SparkSession, m: Int, metric: String,
      shards: Int, efConstruction: Int, seed: Int, efSearch: Int,
      rcMedian: Option[Double], rcQ25: Option[Double]): DataFrame = {
    import spark.implicits._
    Seq((m, metric, shards, efConstruction, seed, efSearch, rcMedian, rcQ25))
      .toDF("m", "metric", "shards", "ef_construction", "seed", "ef_search",
        "rc_median", "rc_q25")
      .repartition(1)
  }

  /** The deterministic insertion-order key ([[shardGraphFrame]]'s
    * scaladoc explains why arrival must be decorrelated from the raw
    * id): a seeded xxhash64 chain, distinct from the shard-assignment
    * hash so shard membership and arrival order stay independent.
    */
  private val InsertOrderSeed: Long = 2654435769L
  private def insertOrderCol(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    xxhash64(id, lit(InsertOrderSeed))

  /** The deterministic shard-graph frame shared by [[build]] and
    * [[reshard]]: shard by id hash, one builder per shard seeing its
    * rows contiguously in HASH-of-id order — byte-identical graphs
    * regardless of source layout.
    *
    * Why hash order and not id order (the pre-r19 recipe): HNSW graph
    * quality is sensitive to insertion order when id order correlates
    * with geometry — a time-ordered corpus whose embedding distribution
    * drifts inserts its oldest regime first, and the graph's upper-level
    * scaffolding (entry point, early hubs) anchors inside a region the
    * rest of the corpus does not live in. MEASURED on the 10⁶ spread
    * fixture (whose first id block is a norm-separated cluster):
    * id-ordered insertion served recall@10 0.8260 at the default beam
    * where the identical member set hash-relabeled served 0.9578
    * (SCALE_r19_hnsw_index_shape_spread* artifacts), and the per-shard
    * diagnostic isolated ORDER as the whole effect (same members, same
    * levels: 0.761 id-ordered vs 0.934 hash-shuffled). A seeded hash of
    * the id decorrelates arrival from any id↔geometry structure while
    * staying fully deterministic; ties fall back to the id.
    */
  private def shardGraphFrame(src: DataFrame, m: Int, efConstruction: Int,
      cosine: Boolean, seed: Int, shards: Int, gen: Int): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    src
      .withColumn("shard", pmod(xxhash64(col("id")), lit(shards)).cast("int"))
      .withColumn("__ins", insertOrderCol(col("id")))
      // PERFECT shard placement (graft.util.ShardSlots): a bare
      // repartition(shards, col("shard")) hash-collides shard keys —
      // ~1/e of the build tasks idle while others construct two whole
      // graphs. The groupBy below still tolerates multi-shard
      // partitions, so the slot mapping is a pure balance hint.
      .withColumn("__slot",
        graft.util.ShardSlots.slotCol(col("shard"), 0 until shards))
      .repartition(shards, col("__slot"))
      .sortWithinPartitions("shard", "__ins", "id")
      .select("id", "vec", "shard")
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        it.toSeq.groupBy(_._3).iterator.flatMap { case (shard, rows) =>
          val g = new HnswGraph(m, efConstruction, cosine, seed)
          rows.foreach { case (id, vec, _) => g.insert(id, vec) }
          g.nodes.iterator.zipWithIndex.map { case ((id, vec, links), pos) =>
            (shard, pos, id, vec, links)
          }
        }
      }
      .toDF("shard", "pos", "id", "vec", "links")
      .withColumn("g", lit(gen))
      // one shard per partition already (the slot repartition above) —
      // no second shuffle; the partitionBy("g","shard") writer emits one
      // file per live (g, shard) from its own task
  }

  /** Atomically publish the shard→generation map as manifest generation
    * `gen`: the JSON is written whole to a dot-prefixed temp name, then
    * renamed into place — readers either see the complete new manifest or
    * keep resolving the previous one.
    *
    * The index assumes a SINGLE writer per directory (like hnswlib's
    * in-process index — concurrent `add_items` callers must serialize).
    * The existence check below turns the worst concurrent-append outcome
    * from a silent last-write-wins (POSIX rename overwrites an existing
    * dest; HDFS returns false) into a loud failure on at least one writer.
    * It is a guard, not a lock: two appenders racing the same generation
    * can still interleave between check and rename on POSIX — serialize
    * writers externally.
    */
  private def writeManifest(
      spark: SparkSession, dir: String, gen: Int, shards: Map[Int, Int],
      counts: Map[Int, Long]): Unit = {
    val mdir = new Path(s"$dir/manifest")
    val fs = mdir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(mdir)
    // counts ride the manifest so search can size its beam from state
    // it already reads (graft.knn.BeamLaw — no extra count job on the
    // serving path). Completeness is REQUIRED at write time: every
    // writer derives counts from the same per-shard agg that derives
    // the shard map, so an incomplete map here is a writer bug — and
    // silently omitting the block would produce a legacy-style manifest
    // that disables the beam law with no signal (search goes inert at
    // the raw knob). Incompleteness stays tolerated on the READ side
    // only, for manifests written before counts rode along.
    require(counts.keySet == shards.keySet,
      s"HnswIndex.writeManifest: counts ${counts.keySet.toSeq.sorted} do " +
        s"not cover shards ${shards.keySet.toSeq.sorted} — a partial map " +
        "would understate the corpus and under-beam every search")
    val countsJson =
      counts.toSeq.sorted.map { case (s, n) => s""""$s":$n""" }
        .mkString(""","counts":{""", ",", "}")
    val json = shards.toSeq.sorted
      .map { case (s, g) => s""""$s":$g""" }
      .mkString("""{"shards":{""", ",", s"}$countsJson}")
    val tmp = new Path(mdir, f".m$gen%06d.json.inprogress")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dest = new Path(mdir, f"m$gen%06d.json")
    if (fs.exists(dest))
      throw new IllegalStateException(
        s"HnswIndex: manifest $dest already exists — concurrent writer detected " +
          "(the index requires a single writer per directory)")
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(s"HnswIndex: manifest commit failed: $dest")
  }

  /** Resolve the live (generation, shard→gen, shard→count) state: the
    * highest-numbered committed manifest. Temp (`.inprogress`) files from
    * a crashed writer never match the committed name pattern. The counts
    * map is EMPTY for a manifest written before counts rode along
    * (readers must treat that as "size unknown" — [[search]]'s beam law
    * goes inert rather than guessing); it self-heals at the next append,
    * build, or reshard.
    */
  private def readManifest(spark: SparkSession, dir: String)
      : (Int, Map[Int, Int], Map[Int, Long]) = {
    val mdir = new Path(s"$dir/manifest")
    val fs = mdir.getFileSystem(spark.sessionState.newHadoopConf())
    // missing manifest/ (an empty dir, or an index persisted by a pre-
    // manifest layout) must surface the clear require below, not an
    // opaque FileNotFoundException from listStatus
    require(fs.exists(mdir), s"HnswIndex: no committed manifest under $dir " +
      "(not an HnswIndex directory, or written by an incompatible layout)")
    // {6,}: if the generation counter ever outgrows %06d's width the
    // 7-digit name must still parse — a full \d{6} match would silently
    // pin readers to the last 6-digit manifest forever
    val pattern = "m(\\d{6,})\\.json".r
    val committed = fs.listStatus(mdir).toSeq
      .flatMap(st => st.getPath.getName match {
        case pattern(n) => Some(n.toInt -> st.getPath)
        case _ => None
      })
    require(committed.nonEmpty, s"HnswIndex: no committed manifest under $dir")
    val (gen, path) = committed.maxBy(_._1)
    val in = fs.open(path)
    val body =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(body)
    val node = root.path("shards")
    require(node.isObject, s"HnswIndex: malformed manifest $path")
    val shards = scala.collection.mutable.Map.empty[Int, Int]
    node.fields().forEachRemaining(e => shards += e.getKey.toInt -> e.getValue.asInt())
    val countsNode = root.path("counts")
    val counts = scala.collection.mutable.Map.empty[Int, Long]
    if (countsNode.isObject)
      countsNode.fields().forEachRemaining(e =>
        counts += e.getKey.toInt -> e.getValue.asLong())
    (gen, shards.toMap, counts.toMap)
  }

  /** The live node rows per the manifest — exactly the committed
    * generation directory of each shard; orphans from a crashed append
    * are never listed.
    */
  private def loadNodes(spark: SparkSession, dir: String,
      shardGens: Map[Int, Int]): DataFrame = {
    val paths = shardGens.toSeq.sorted
      .map { case (s, g) => s"$dir/nodes/g=$g/shard=$s" }
    spark.read.option("basePath", s"$dir/nodes").parquet(paths: _*)
  }

  /** Per-shard occupancy of the LIVE generation: (shard, n_nodes) — the
    * balance diagnostic of the [[graft.knn.IvfIndex.stats]] family (query
    * latency follows the largest shard's graph, and appended batches land
    * whole shards, so drifted ingest skews here first). Reads only the
    * partition columns of the manifest's shard paths.
    */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val (_, shardGens, _) = readManifest(spark, dir)
    loadNodes(spark, dir, shardGens)
      .groupBy("shard")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_nodes"))
  }

  /** One-row health surface — the [[IvfIndex.staleness]] counterpart for
    * the graph family. The IVF signal answers "is a rebuild due?"
    * (quality decays through codebook drift); HNSW quality decay is
    * corpus-GROWTH-driven and [[BeamLaw]] compensates automatically at
    * serving time, so the operator questions left are capacity and
    * hygiene — answered here from state the index already persists,
    * with ZERO Spark jobs (manifest JSON + two directory listings):
    *
    *  - `n_nodes` — live corpus size from the manifest-v2 counts (null
    *    for a legacy counts-less manifest: unknown, and the beam law is
    *    then inert — see `beam_law_active`);
    *  - `n_shards`, `max_shard_nodes`, `shard_skew` — per-shard count
    *    skew (max/mean). Query latency follows the LARGEST shard's
    *    graph (every query beams every shard; the slowest task gates the
    *    merge), and hash sharding keeps skew ≈ 1 — a high value means
    *    pathological id clustering: [[reshard]] is the knob;
    *  - `beam_law_active` — whether [[search]] will auto-scale the beam
    *    (counts complete and not overridden); false on a legacy manifest
    *    means a grown corpus serves at the RAW base beam, shedding the
    *    measured recall — heal by any append/build/[[reshard]];
    *  - `base_ef`, `effective_ef`, `beam_doublings` — the beam the law
    *    will pick at the current size ([[BeamLaw.autoEf]]) for the
    *    index's OWN serving beam (params' `ef_search` — what an untuned
    *    [[search]] actually runs; the `baseEf` argument overrides for
    *    what-if probing): the per-query search-cost multiplier an
    *    operator is implicitly paying, and the capacity signal (each
    *    doubling ≈ 2× search compute for ~5× catalog — a high doubling
    *    count says the build-time shard sizing is due a [[reshard]]
    *    upward);
    *  - `orphan_paths` — unreferenced generation/shard directories and
    *    superseded manifests (crash debris / failed best-effort deletes;
    *    the graph family has no tombstones, so dead FILES, not dead
    *    rows, are its vacuum bookkeeping): the storage [[vacuum]] would
    *    reclaim;
    *  - `rc_q25`, `shape` — the build-time shape probe's evidence and
    *    verdict ("spread"/"clustered" — which measured recall column
    *    the persisted default beam was chosen from; see [[build]]'s
    *    SERVING BEAM contract). Null when the beam was explicit, the
    *    build was below [[ShapeProbeAbove]], or the layout is
    *    pre-column legacy — the probe never ran, so there is no
    *    evidence to report.
    *
    * Cost: the manifest JSON, two directory listings, and one one-row
    * params collect (the row's only Spark job — the price of reporting
    * the beam the index will actually serve instead of an argument).
    *
    * CONCURRENCY: deliberately lock-free and recovery-free — a health
    * probe must never contend with (or heal under) a live writer. The
    * consequence: during a concurrent append/reshard commit window, or
    * against an index whose last writer crashed mid-swap, the orphan
    * count can include legitimately-staged next-generation directories
    * and the read can even throw on mid-rename state — `orphan_paths`
    * is ADVISORY under concurrency; re-read after the writer settles
    * (or after any maintenance op has run recovery) for a durable
    * number.
    */
  def staleness(spark: SparkSession, dir: String,
      baseEf: Int = UseIndexDefault): DataFrame = {
    import spark.implicits._
    val (liveGen, shardGens, counts) = readManifest(spark, dir)
    val params = loadParams(spark, dir)
    val resolvedBaseEf =
      if (baseEf == UseIndexDefault) params.efSearch else baseEf
    val complete = counts.keySet == shardGens.keySet && shardGens.nonEmpty
    val nNodes: Option[Long] = if (complete) Some(counts.values.sum) else None
    val maxShard: Option[Long] = if (complete) Some(counts.values.max) else None
    val skew: Option[Double] =
      nNodes.filter(_ > 0).map(n =>
        counts.values.max.toDouble / (n.toDouble / shardGens.size))
    val effEf = effectiveEf(resolvedBaseEf, efAutoScale = true, shardGens,
      counts)
    val doublings =
      if (complete && resolvedBaseEf > 0) BeamLaw.doublings(counts.values.sum)
      else 0
    // hygiene listing: same walk as vacuumImpl, count-only — orphaned
    // (gen, shard) dirs plus superseded/torn manifests
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val ndir = new Path(s"$dir/nodes")
    val genPat = "g=(\\d+)".r
    val shardPat = "shard=(\\d+)".r
    var orphans = 0L
    if (fs.exists(ndir)) fs.listStatus(ndir).foreach { gSt =>
      gSt.getPath.getName match {
        case genPat(g) =>
          fs.listStatus(gSt.getPath).foreach { sSt =>
            sSt.getPath.getName match {
              case shardPat(sh) if !shardGens.get(sh.toInt).contains(g.toInt) =>
                orphans += 1
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    val mPat = "m(\\d{6,})\\.json".r
    fs.listStatus(new Path(s"$dir/manifest")).foreach { st =>
      st.getPath.getName match {
        case mPat(n) if n.toInt < liveGen => orphans += 1
        case name if name.endsWith(".inprogress") => orphans += 1
        case _ => ()
      }
    }
    // which measured recall column this index's default beam was chosen
    // from (build's shape probe — see [[build]]'s SERVING BEAM contract):
    // null/null when the beam was explicit, below-threshold, or legacy
    val shape: Option[String] = params.rcQ25.map(q =>
      if (q <= ShapeStats.SpreadRcMax) "spread" else "clustered")
    Seq((nNodes, shardGens.size, maxShard, skew, complete,
        resolvedBaseEf, effEf, doublings, orphans, params.rcQ25, shape))
      .toDF("n_nodes", "n_shards", "max_shard_nodes", "shard_skew",
        "beam_law_active", "base_ef", "effective_ef", "beam_doublings",
        "orphan_paths", "rc_q25", "shape")
  }

  /** The persisted hyperparameters plus the declared serving beam and
    * its shape evidence. A pre-column legacy layout reads `ef_search`
    * as [[DefaultServeEf]] — the engine-wide untuned default such an
    * index was always served at, not a guess — and the rc columns as
    * None (never measured).
    */
  private[graft] final case class Params(m: Int, metric: String, shards: Int,
      efConstruction: Int, seed: Int, efSearch: Int,
      rcMedian: Option[Double], rcQ25: Option[Double])

  /** Commit-generation fingerprint of `params/` — the revalidation key
    * for an ingest loop's per-loop params memo (the
    * [[graft.knn.IvfIndex.metaGen]] contract: appends never touch
    * params, but a build/reshard committing — or being crash-recovered
    * by the loop's own in-lock `recoverReshard` — between batches swaps
    * the table, and a memo serving the pre-swap shard count would route
    * fresh ids to shards the live manifest does not hold). Filesystem
    * metadata only, no Spark jobs.
    */
  private[graft] def metaGen(spark: SparkSession, dir: String): Long =
    graft.util.StagedTables.metaFingerprint(
      new Path(dir).getFileSystem(spark.sessionState.newHadoopConf()),
      dir, Seq("params"))

  private[graft] def loadParams(spark: SparkSession, dir: String): Params = {
    val raw = spark.read.parquet(s"$dir/params")
    val df = Seq[(String, org.apache.spark.sql.Column)](
        "ef_search" -> lit(DefaultServeEf).cast("int"),
        "rc_median" -> lit(null).cast("double"),
        "rc_q25" -> lit(null).cast("double"))
      .foldLeft(raw) { case (d, (c, v)) =>
        if (d.columns.contains(c)) d else d.withColumn(c, v)
      }
    val rows = df
      .select("m", "metric", "shards", "ef_construction", "seed", "ef_search",
        "rc_median", "rc_q25")
      .collect()
    require(rows.length == 1, s"HnswIndex: malformed params under $dir")
    val r = rows.head
    Params(r.getInt(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4),
      r.getInt(5),
      if (r.isNullAt(6)) None else Some(r.getDouble(6)),
      if (r.isNullAt(7)) None else Some(r.getDouble(7)))
  }

  /** Append new vectors WITHOUT rebuilding the whole index: each new
    * vector routes to its deterministic shard, the affected shards'
    * graphs are restored and the new elements inserted incrementally
    * (hnswlib `add_items` semantics — graph insertion is order-dependent,
    * so an appended index is a valid HNSW over the union but not
    * byte-identical to a from-scratch build), and ONLY those shards are
    * rewritten — untouched shards' files are not read or written.
    *
    * Crash-atomic: the rebuilt shards land in a NEW generation directory
    * (plain parquet append — no live file is touched), and the append
    * commits by publishing a new manifest (atomic rename). A failure at
    * any earlier point leaves the previous manifest resolving the
    * previous, fully-intact generation; files a crashed attempt staged
    * under the next generation are cleared before the retry stages its
    * own (they would otherwise combine into duplicated node rows at the
    * commit). Superseded generation directories are deleted best-effort
    * AFTER the commit.
    *
    * Hyperparameters come from `params/`. Returns the appended row count.
    */
  def append(
      spark: SparkSession,
      dir: String,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      takeLock: Boolean = true,
      checkBatchUnique: Boolean = true,
      checkPresence: Boolean = true,
      preParams: Option[Params] = None): Long =
    // takeLock = false is for callers ALREADY holding the directory's
    // writer lock (the watermarked ingest gate locks the whole
    // micro-batch); the lock is not reentrant, so a nested acquire would
    // fail fast against the caller's own hold.
    // checkBatchUnique/checkPresence = false skip the respective guard
    // for callers that have JUST established the property themselves
    // (the streaming ingester's freshness marker join establishes
    // absence; its input contract covers within-batch uniqueness) — the
    // [[graft.dedup.LshDedupIndex.append]] family contract: each skipped
    // guard is one fewer Spark job per micro-batch, and skipping only
    // moves responsibility, never what a violation does.
    if (!takeLock) appendImpl(spark, dir, newVectors, idCol, vecCol,
      checkBatchUnique, checkPresence, preParams)
    else
      graft.util.IndexLock.withLock(spark, dir, "HnswIndex.append") {
        appendImpl(spark, dir, newVectors, idCol, vecCol,
          checkBatchUnique, checkPresence, preParams)
      }

  /** The committed id set (one `id` column over the live generations).
    * Package-private for the streaming ingester's freshness marker join,
    * mirroring [[IvfIndex.readIds]].
    */
  private[graft] def readIds(spark: SparkSession, dir: String): DataFrame = {
    val (_, shardGens, _) = readManifest(spark, dir)
    if (shardGens.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))))
    else loadNodes(spark, dir, shardGens).select(col("id"))
  }

  private def appendImpl(
      spark: SparkSession,
      dir: String,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      checkBatchUnique: Boolean = true,
      checkPresence: Boolean = true,
      preParams: Option[Params] = None): Long = {
    import spark.implicits._
    // heal a crashed reshard BEFORE reading params ([[IvfIndex]] runs
    // recoverSwap at every writer entry for the same reason): a reshard
    // that died after its params swap but before the manifest commit
    // leaves params describing a shard count the live manifest does not
    // — loadParams would then route ids by the uncommitted count while
    // the presence check reads the committed layout, silently admitting
    // duplicate nodes. Idempotent, so the streaming thunk's own call is
    // a harmless second pass. (A preParams caller owns this ordering:
    // its params were loaded AFTER its own in-lock recovery ran.)
    if (preParams.isEmpty) recoverReshard(spark, dir)
    val Params(m, metric, shards, efConstruction, seed, _, _, _) =
      preParams.getOrElse(loadParams(spark, dir))
    val cosine = HnswSearch.isCosine(metric)
    val fresh = newVectors
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .withColumn("shard", pmod(xxhash64(col("id")), lit(shards)).cast("int"))
      .cache()
    try {
      // ONE agg over the cached batch serves the touched-shard set, the
      // appended-row count, AND the manifest's incremental count update
      // (this replaces the former separate distinct + count jobs — two
      // fewer scheduler round-trips per streaming micro-batch)
      val freshByShard = fresh.groupBy("shard").count()
        .as[(Int, Long)].collect().toMap
      val touched = freshByShard.keys.toArray.sorted
      if (touched.isEmpty) return 0L
      val nNew = freshByShard.values.sum
      // duplicate labels are rejected, matching hnswlib add_items: a
      // silent double-insert would persist two nodes with one external id
      // and search would return that neighbor twice within top-k
      if (checkBatchUnique)
        require(fresh.groupBy("id").count().filter(col("count") > 1).isEmpty,
          "HnswIndex.append: duplicate ids within the appended batch")

      val (gen, shardGens, oldCounts) = readManifest(spark, dir)
      val touchedLive = shardGens.view.filterKeys(touched.contains).toMap
      val existing = (if (touchedLive.isEmpty)
          spark.emptyDataset[(Int, Int, Long, Array[Float], Seq[Seq[Int]])].toDF(
            "shard", "pos", "id", "vec", "links")
        else loadNodes(spark, dir, touchedLive))
        .select(col("shard").cast("int"), col("pos"), col("id"),
          col("vec").cast("array<float>"),
          col("links").cast("array<array<int>>"))
        .as[(Int, Int, Long, Array[Float], Seq[Seq[Int]])]
      if (checkPresence)
        require(existing.select("id")
          .join(fresh.select("id"), "id").isEmpty,
          "HnswIndex.append: id already present in the index")
      val rebuilt = rebuildTouchedShards(existing.toDF(),
          fresh.select(col("shard"), col("id"), col("vec")),
          touched.toSeq, m, cosine, efConstruction, seed)
        .withColumn("g", lit(gen + 1))
      val fs = new Path(s"$dir/nodes").getFileSystem(
        spark.sessionState.newHadoopConf())
      // the live manifest resolves gen, so anything already under
      // g=gen+1 is debris from an append that crashed BEFORE its commit:
      // staging into it un-cleared would append a second copy of every
      // rebuilt row and the manifest below would commit the duplicates
      // (single-writer assumption, as documented on this method)
      fs.delete(new Path(s"$dir/nodes/g=${gen + 1}"), true)
      // the rebuilt shards land in generation gen+1: plain append, no
      // live file rewritten — the manifest rename below is the commit
      rebuilt.write.mode(SaveMode.Append)
        .partitionBy("g", "shard")
        .parquet(s"$dir/nodes")
      val newShardGens = shardGens ++ touched.map(_ -> (gen + 1))
      // counts update incrementally (append never deletes: new count =
      // old + fresh per touched shard). A legacy counts-less manifest
      // heals ONCE here with a partition-column-only count over the new
      // live layout (the staged g=gen+1 dirs are durable at this point;
      // the manifest rename below is still the only commit)
      val newCounts: Map[Int, Long] =
        if (oldCounts.keySet == shardGens.keySet)
          oldCounts ++ touched.map(s =>
            s -> (oldCounts.getOrElse(s, 0L) + freshByShard.getOrElse(s, 0L)))
        else loadNodes(spark, dir, newShardGens)
          .groupBy("shard").count().as[(Int, Long)].collect().toMap
      writeManifest(spark, dir, gen + 1, newShardGens, newCounts)
      // superseded generation dirs are garbage once the new manifest is
      // committed; deletion is best-effort (a failure here leaves orphans,
      // never an inconsistent index)
      touchedLive.foreach { case (s, g) =>
        try fs.delete(new Path(s"$dir/nodes/g=$g/shard=$s"), true)
        catch { case scala.util.control.NonFatal(_) => }
      }
      nNew
    } finally fresh.unpersist()
  }

  /** [[append]]'s touched-shard rebuild as ONE slot-placed partition
    * pass: existing nodes (restore order = `pos`) and fresh rows
    * (insert order = hash-of-id, the [[shardGraphFrame]] decorrelation
    * rule, marked `pos = -1`) union into a single frame,
    * PERFECT-placed one shard per task via [[graft.util.ShardSlots]]
    * (the same contract the build and search stages use — a cogroup on
    * `groupByKey(shard)` hash-collided shard keys exactly like the bare
    * `repartition(col("shard"))` the r16 fix removed elsewhere: with S
    * touched shards into the shuffle's partitions, ~1/e of the rebuild
    * tasks idled while others restored+inserted two whole graphs), and
    * each task restores its graph and replays the inserts. Output is
    * already one shard per partition, so the caller's
    * `partitionBy("g","shard")` writer emits one file per shard from
    * its own task with NO second shuffle (the cogroup shape paid one).
    * Per-shard output is byte-identical to the cogroup it replaces:
    * same restore order, same insert order, same zipWithIndex `pos`.
    */
  private[graft] def rebuildTouchedShards(
      existing: DataFrame,
      fresh: DataFrame,
      touched: Seq[Int],
      m: Int,
      cosine: Boolean,
      efConstruction: Int,
      seed: Int): DataFrame = {
    val spark = existing.sparkSession
    import spark.implicits._
    existing
      .select(col("shard"), col("pos"), col("id"), col("vec"), col("links"))
      .unionByName(fresh.select(col("shard"), lit(-1).as("pos"), col("id"),
        col("vec"), lit(null).cast("array<array<int>>").as("links")))
      .withColumn("__ins", insertOrderCol(col("id")))
      .withColumn("__slot",
        graft.util.ShardSlots.slotCol(col("shard"), touched))
      .repartition(touched.size, col("__slot"))
      .select("shard", "pos", "id", "vec", "links", "__ins")
      .as[(Int, Int, Long, Array[Float], Seq[Seq[Int]], Long)]
      .mapPartitions { it =>
        it.toSeq.groupBy(_._1).iterator.flatMap { case (shard, rows) =>
          // pos >= 0 marks a persisted node (links ride along); -1 a
          // fresh insert — links may legitimately be empty, never null,
          // so the marker is positional, not the links column
          val (olds, news) = rows.partition(_._2 >= 0)
          val g = HnswGraph.restore(m, cosine,
            olds.sortBy(_._2).map { case (_, _, id, vec, links, _) =>
              (id, vec, links) },
            efConstruction, seed)
          news.sortBy(r => (r._6, r._3)).foreach { case (_, _, id, vec, _, _) =>
            g.insert(id, vec) }
          g.nodes.iterator.zipWithIndex.map { case ((id, vec, links), pos) =>
            (shard, pos, id, vec, links)
          }
        }
      }
      .toDF("shard", "pos", "id", "vec", "links")
  }

  /** Probe the persisted index: every shard's graph is restored in place
    * (one pass over `nodes/`, no re-insertion), the broadcast query set
    * beams through it, and per-shard top-k partials merge in one ranking
    * window — the [[ApproxKnn.hnswKnn]] execution over restored state.
    * `m` and the metric come from the persisted `params/`, never from the
    * caller.
    *
    * Beam law: a positive `efSearch` is the beam at gate-tier scale —
    * past [[BeamLaw.HoldKeys]] live nodes it is widened by the measured
    * [[BeamLaw.autoEf]] rule (the index's corpus grows under streaming
    * appends exactly the way the grid's catalog grows across tiers, and
    * a fixed beam sheds the same measured recall). The size comes from
    * the manifest's counts — state this method already reads, zero
    * extra jobs on the serving path. `efAutoScale = false` pins the raw
    * knob; `efSearch <= 0` (full beam, rank-exact) passes through
    * unscaled; a legacy counts-less manifest leaves the law inert (raw
    * knob) until the next append/build/reshard heals it.
    */
  def search(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      efSearch: Int = UseIndexDefault,
      excludeSelf: Boolean = true,
      efAutoScale: Boolean = true,
      preParams: Option[Params] = None): DataFrame = {
    import spark.implicits._
    // preParams: caller-loaded params — a per-batch caller (the streaming
    // HNSW ingester) loads them once per LOOP (generation-keyed memo)
    // and shares them between its probe and its append, the
    // [[IvfIndex.search]] preMeta contract
    val params = preParams.getOrElse(loadParams(spark, dir))
    val (m, metric, efDefault) = (params.m, params.metric, params.efSearch)
    val cosine = HnswSearch.isCosine(metric)
    val bc = spark.sparkContext.broadcast(
      HnswSearch.collectQueries(queries, idCol, vecCol, "HnswIndex.search"))

    // the UNTUNED call serves the beam the index declares for itself
    // (params' ef_search — 64 on every index built before the column
    // and on defaults, so behavior is unchanged unless a builder SET a
    // serving beam); an explicit efSearch, including the <= 0 full-beam
    // sentinel, overrides as before
    val baseEf = if (efSearch == UseIndexDefault) efDefault else efSearch
    val (_, shardGens, counts) = readManifest(spark, dir)
    val (kL, efS, ex) =
      (k, effectiveEf(baseEf, efAutoScale, shardGens, counts), excludeSelf)
    // an empty manifest (reachable: readIds special-cases it, and the
    // streaming gate probes BEFORE the first append) has no neighbors —
    // an empty correctly-shaped frame, not a zero-path parquet read
    // dying on schema inference before the bootstrap append ever runs
    if (shardGens.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        IvfIndex.searchSchema)
    // PERFECT shard placement (graft.util.ShardSlots) — one restored
    // graph per task: a bare repartition(col("shard")) hash-collides
    // shard keys, measured on the 200k-key grid tier as 18 non-empty
    // beam tasks out of 32 with 40–437 s spreads (a doubled task beams
    // every query through TWO graphs while a third of the cores idle).
    // The groupBy below still tolerates multi-shard partitions, so the
    // slot mapping is a pure balance hint.
    val liveShards = shardGens.keys.toSeq.sorted
    val partials = loadNodes(spark, dir, shardGens)
      .withColumn("__slot",
        graft.util.ShardSlots.slotCol(col("shard"), liveShards))
      .repartition(liveShards.size, col("__slot"))
      .sortWithinPartitions("shard", "pos")
      .select(col("shard"), col("id"), col("vec").cast("array<float>"),
        col("links").cast("array<array<int>>"))
      .as[(Int, Long, Array[Float], Seq[Seq[Int]])]
      .mapPartitions { it =>
        it.toSeq.groupBy(_._1).iterator.flatMap { case (_, rows) =>
          val g = HnswGraph.restore(m, cosine,
            rows.map { case (_, id, vec, links) => (id, vec, links) })
          HnswSearch.beamAll(g, bc.value, kL, efS, ex)
        }
      }
      .toDF("query_id", "neighbor_id", "dist")

    HnswSearch.topKMerge(partials, k)
  }

  /** [[search]]/[[staleness]]'s "use the persisted serving beam"
    * sentinel — distinct from the <= 0 full-beam (rank-exact) sentinel,
    * which remains an explicit caller choice and passes through.
    */
  val UseIndexDefault: Int = Int.MinValue

  /** [[search]]'s beam resolution, isolated for direct spec pinning:
    * the [[BeamLaw]] applies only when the caller left auto-scaling on
    * AND the manifest's counts are complete (an incomplete/legacy map
    * must never under-state the corpus and silently under- or
    * over-beam — the law goes inert, raw knob, instead of guessing).
    */
  private[graft] def effectiveEf(efSearch: Int, efAutoScale: Boolean,
      shardGens: Map[Int, Int], counts: Map[Int, Long]): Int =
    if (efAutoScale && counts.keySet == shardGens.keySet)
      BeamLaw.autoEf(efSearch, counts.values.sum)
    else efSearch

  private val ReshardMarker = "_reshard_commit"

  /** Re-shard the persisted index IN PLACE — the [[IvfIndex.rebalance]]
    * counterpart for the graph family: shard count is the scale knob
    * (per-shard graph size bounds both build memory and probe latency),
    * and an index whose corpus 10×-ed past its build-time sizing needs
    * the knob turnable without a from-scratch rebuild of the caller's
    * pipeline. Every live node row is re-assigned by the deterministic
    * id hash under `newShards` and each new shard's graph is rebuilt
    * with the build recipe (hash-ordered insertion — the resharded
    * index is byte-deterministic, exactly as a fresh [[build]] of the
    * same corpus at `newShards` would be).
    *
    * Crash-atomic via the manifest pivot: the new shards stage into
    * generation `gen+1` (no live file touched), the new `params/`
    * (updated shard count) stages beside the live table, and a marker
    * file carrying the target generation brackets the params swap +
    * manifest commit. [[recoverReshard]] — run on entry here and inside
    * the streaming ingest's locked committed-id thunk — rolls an
    * interrupted swap FORWARD when the manifest committed and BACK when
    * it did not, so no crash point leaves params and manifest durably
    * disagreeing. Search is shard-layout-blind (every shard is beamed,
    * partials merge globally), so a search at full beam answers
    * identically before and after. Returns the node count resharded.
    */
  def reshard(
      spark: SparkSession,
      dir: String,
      newShards: Int): Long =
    graft.util.IndexLock.withLock(spark, dir, "HnswIndex.reshard") {
      reshardImpl(spark, dir, newShards)
    }

  private def reshardImpl(
      spark: SparkSession,
      dir: String,
      newShards: Int): Long = {
    import spark.implicits._
    require(newShards > 0, s"HnswIndex.reshard: newShards must be positive, got $newShards")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    recoverReshardLocked(spark, fs, dir)
    val Params(m, metric, _, efConstruction, seed, efSearch, rcMed, rcQ25) =
      loadParams(spark, dir)
    val cosine = HnswSearch.isCosine(metric)
    val (gen, shardGens, _) = readManifest(spark, dir)
    val corpus = (if (shardGens.isEmpty)
        spark.emptyDataset[(Long, Array[Float])].toDF("id", "vec")
      else loadNodes(spark, dir, shardGens).select(col("id"), col("vec")))
      .select(col("id").cast("long"), col("vec").cast("array<float>"))
    // same deterministic recipe as buildLocked: contiguous shard rows,
    // hash-ordered insertion
    val rebuilt = shardGraphFrame(corpus, m, efConstruction, cosine, seed,
      newShards, gen + 1)
    // anything already under g=gen+1 is debris from a crashed attempt
    // (same single-writer argument as appendImpl)
    fs.delete(new Path(s"$dir/nodes/g=${gen + 1}"), true)
    rebuilt.write.mode(SaveMode.Append)
      .partitionBy("g", "shard")
      .parquet(s"$dir/nodes")
    // ef_search and the shape evidence ride through unchanged — reshard
    // keeps the corpus, so it keeps the corpus's declared serving beam
    // and the rc measurement that chose it
    paramsDf(spark, m, metric, newShards, efConstruction, seed, efSearch,
        rcMed, rcQ25)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/params.tmp")
    val byShard = (if (fs.exists(new Path(s"$dir/nodes/g=${gen + 1}")))
        spark.read.option("basePath", s"$dir/nodes")
          .parquet(s"$dir/nodes/g=${gen + 1}")
          .groupBy("shard").count().as[(Int, Long)].collect().toSeq
      else Seq.empty[(Int, Long)])
    // the marker carries the target generation: recovery rolls FORWARD
    // iff a manifest at (or past) it committed, BACK otherwise. Atomic
    // publish — a torn marker would fail every later writer's parse
    val marker = new Path(s"$dir/$ReshardMarker")
    graft.util.StagedTables.writeMarker(fs, dir, ReshardMarker,
      String.valueOf(gen + 1))
    val live = new Path(s"$dir/params")
    val old = new Path(s"$dir/params.old")
    val tmp = new Path(s"$dir/params.tmp")
    require(fs.rename(live, old), s"HnswIndex.reshard: could not stage $live")
    require(fs.rename(tmp, live), s"HnswIndex.reshard: could not commit $tmp")
    writeManifest(spark, dir, gen + 1, byShard.map(_._1 -> (gen + 1)).toMap,
      byShard.toMap)
    fs.delete(old, true)
    fs.delete(marker, false)
    // superseded generations are garbage once the manifest committed;
    // best-effort (a failure leaves orphans for vacuum, never an
    // inconsistent index)
    shardGens.foreach { case (s, g) =>
      try fs.delete(new Path(s"$dir/nodes/g=$g/shard=$s"), true)
      catch { case scala.util.control.NonFatal(_) => }
    }
    byShard.map(_._2).sum
  }

  /** On-entry crash recovery for an interrupted [[reshard]] — the
    * [[IvfIndex.recoverSwap]] counterpart, safe to call any time the
    * caller holds the writer lock (the streaming ingest's committed-id
    * thunk calls it before [[readIds]], so a crashed reshard heals on
    * the next micro-batch instead of bricking the ingest). Roll
    * FORWARD (delete debris) when the marker's target manifest
    * committed; roll BACK (restore the old params) when it did not.
    */
  private[graft] def recoverReshard(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    recoverReshardLocked(spark, fs, dir)
  }

  private def recoverReshardLocked(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit = {
    val marker = new Path(s"$dir/$ReshardMarker")
    val live = new Path(s"$dir/params")
    val old = new Path(s"$dir/params.old")
    val tmp = new Path(s"$dir/params.tmp")
    graft.util.StagedTables.sweepMarkerTmp(fs, dir, ReshardMarker)
    if (fs.exists(marker)) {
      val raw = graft.util.StagedTables.readMarker(fs, marker)
      // `build:<gen>` = a generation-staged rebuild ([[build]] over a
      // live index); bare `<gen>` = a reshard. Same swap recovery; a
      // build additionally owes the fresh corpus a cleared ingest state.
      // Markers publish atomically, so unparseable content is real
      // corruption — fail with a named error, not a bare
      // NumberFormatException
      val isBuild = raw.startsWith("build:")
      val num = if (isBuild) raw.stripPrefix("build:") else raw
      require(num.nonEmpty && num.forall(_.isDigit),
        s"HnswIndex: malformed commit marker '$raw' under $dir")
      val target = num.toInt
      val committed =
        try readManifest(spark, dir)._1 >= target
        catch { case _: IllegalArgumentException => false }
      if (committed) { // forward: the swap's leftovers are garbage
        fs.delete(old, true)
        fs.delete(tmp, true)
        if (isBuild) graft.util.IngestState.clear(spark, dir)
      } else { // back: restore the pre-reshard params
        if (fs.exists(old)) {
          fs.delete(live, true)
          require(fs.rename(old, live),
            s"HnswIndex: could not roll back params under $dir")
        }
        fs.delete(tmp, true)
      }
      fs.delete(marker, false)
    } else
      // markerless debris: a staging-only crash (tmp) or a completed
      // swap's failed cleanup (old, only when live params exist) — the
      // shared single-table rollback protocol
      graft.util.StagedTables.rollBack(fs, dir, Seq("params"),
        "HnswIndex.recover")
  }

  /** Garbage-collect orphaned state: generation directories not referenced
    * by the live manifest (left behind when an append crashed after staging
    * its new generation but before the manifest rename, or when the
    * post-commit best-effort delete of superseded generations failed) and
    * manifests older than the live one. Safe to run any time under the
    * single-writer assumption — the live manifest's referenced directories
    * are never touched, so search before/after vacuum answers identically.
    * Returns the number of paths removed.
    */
  def vacuum(spark: SparkSession, dir: String): Int =
    graft.util.IndexLock.withLock(spark, dir, "HnswIndex.vacuum") {
      vacuumImpl(spark, dir)
    }

  private def vacuumImpl(spark: SparkSession, dir: String): Int = {
    // writer entry: heal a crashed reshard first (see [[appendImpl]]) —
    // vacuum keying off a params/manifest pair a dead reshard left
    // disagreeing would treat the committed layout's directories as
    // orphans
    recoverReshard(spark, dir)
    val (liveGen, shardGens, _) = readManifest(spark, dir)
    val ndir = new Path(s"$dir/nodes")
    val fs = ndir.getFileSystem(spark.sessionState.newHadoopConf())
    val genPat = "g=(\\d+)".r
    val shardPat = "shard=(\\d+)".r
    var removed = 0
    if (fs.exists(ndir)) fs.listStatus(ndir).foreach { gSt =>
      gSt.getPath.getName match {
        case genPat(g) =>
          val gen = g.toInt
          fs.listStatus(gSt.getPath).foreach { sSt =>
            sSt.getPath.getName match {
              case shardPat(sh) if !shardGens.get(sh.toInt).contains(gen) =>
                if (fs.delete(sSt.getPath, true)) removed += 1
              case _ => ()
            }
          }
          // a generation dir emptied of shards is itself garbage
          if (fs.listStatus(gSt.getPath).isEmpty && fs.delete(gSt.getPath, true))
            removed += 1
        case _ => ()
      }
    }
    val mdir = new Path(s"$dir/manifest")
    val mPat = "m(\\d{6,})\\.json".r
    fs.listStatus(mdir).foreach { st =>
      st.getPath.getName match {
        case mPat(n) if n.toInt < liveGen =>
          if (fs.delete(st.getPath, false)) removed += 1
        // a writeManifest that crashed between create and rename leaves
        // its temp file behind forever — crash debris this tool exists
        // to collect (single-writer: no in-flight commit can be racing)
        case name if name.endsWith(".inprogress") =>
          if (fs.delete(st.getPath, false)) removed += 1
        case _ => ()
      }
    }
    removed
  }
}
