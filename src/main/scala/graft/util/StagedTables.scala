package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Marker-protected multi-table commit shared by the persistent index
  * families (IVF build/rebalance, LSH and BM25 build): the writer stages
  * every table as `<table>.tmp` beside the live one, creates an intent
  * marker, swaps, runs its post-swap steps, and deletes the marker.
  * Sequenced Overwrites of the live tables are NOT crash-safe — a crash
  * between two of them leaves params describing data they were never
  * computed against (a new quantizer over old lists, new LSH banding
  * over old signatures), and probes then return silently wrong results
  * with no error raised.
  *
  * Recovery contract (run by the family at every writer entry): marker
  * present → the swaps were in flight; [[swapStaged]] is resume-safe
  * from whichever rename the crash interrupted, after which the caller
  * replays its post-swap steps and deletes the marker. No marker →
  * staging never committed; [[rollBack]] deletes staged/old debris (live
  * tables were never renamed before the marker existed).
  *
  * Readers during the swap window can see a transitional mix; the
  * single-writer lock plus metadata-only renames make the exposure
  * milliseconds, and recovery converges it at the next writer entry.
  */
object StagedTables {

  /** Commit every staged `<table>.tmp` over its live table. A table with
    * nothing staged is skipped (not every writer stages every table); a
    * missing live table (first build into a fresh dir) commits without
    * the stage-out rename. Resume-safe: identical to the roll-forward
    * recovery path, so a crash at ANY rename re-runs to the same end
    * state.
    */
  def swapStaged(fs: FileSystem, dir: String, tables: Seq[String],
      op: String): Unit =
    tables.foreach { t =>
      val live = new Path(s"$dir/$t")
      val old = new Path(s"$dir/$t.old")
      val tmp = new Path(s"$dir/$t.tmp")
      if (fs.exists(tmp)) {
        if (fs.exists(live))
          require(fs.rename(live, old), s"$op: could not stage $live")
        require(fs.rename(tmp, live), s"$op: could not commit $tmp")
      }
      if (fs.exists(old)) fs.delete(old, true)
    }

  /** Delete staged/old debris of an UNcommitted write (no marker): a
    * surviving `<table>.old` with its live table missing is a crashed
    * markerless swap (the vacuum protocol) and is restored; everything
    * else is debris.
    */
  def rollBack(fs: FileSystem, dir: String, tables: Seq[String],
      op: String): Unit =
    tables.foreach { t =>
      val live = new Path(s"$dir/$t")
      val old = new Path(s"$dir/$t.old")
      val tmp = new Path(s"$dir/$t.tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      if (!fs.exists(live) && fs.exists(old))
        require(fs.rename(old, live), s"$op: could not restore $old")
      else if (fs.exists(old)) fs.delete(old, true)
    }

  /** Create the marker, swap, run the post-swap steps, delete the
    * marker. `postSwap` must be idempotent — recovery replays it.
    */
  def commit(fs: FileSystem, dir: String, markerFile: String,
      tables: Seq[String], op: String)(postSwap: => Unit): Unit = {
    val marker = new Path(s"$dir/$markerFile")
    fs.create(marker, /* overwrite = */ false).close()
    swapStaged(fs, dir, tables, op)
    postSwap
    fs.delete(marker, false)
  }

  /** Publish an intent marker ATOMICALLY with its content: bytes land in
    * a dot-prefixed temp file renamed to the marker name, so the marker
    * either exists with its FULL content or not at all. A bare
    * create-then-write can crash in between, leaving a 0-byte marker
    * whose op/target recovery would misread — e.g. a torn BUILD marker
    * rolling forward as a rebalance, skipping the ingest-state clear the
    * build owed. Callers' recovery should [[sweepMarkerTmp]] on entry.
    */
  def writeMarker(fs: FileSystem, dir: String, markerFile: String,
      content: String): Unit = {
    val tmp = new Path(s"$dir/.$markerFile.tmp")
    val out = fs.create(tmp, /* overwrite = */ true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, new Path(s"$dir/$markerFile")),
      s"StagedTables: could not publish $markerFile under $dir")
  }

  /** The marker's full content. IO failures PROPAGATE — with
    * [[writeMarker]]'s atomic publish a marker is never torn, so an
    * unreadable one is a real store fault, and silently defaulting the
    * op would misdirect recovery.
    */
  def readMarker(fs: FileSystem, marker: Path): String = {
    val in = fs.open(marker)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Delete a crashed [[writeMarker]]'s temp (never read — dot-prefixed
    * — but it should not accumulate).
    */
  def sweepMarkerTmp(fs: FileSystem, dir: String, markerFile: String): Unit = {
    val tmp = new Path(s"$dir/.$markerFile.tmp")
    try { if (fs.exists(tmp)) fs.delete(tmp, false) }
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Commit-generation fingerprint of a set of swap-committed metadata
    * tables — the cache key that lets a long-running reader (an ingest
    * loop's per-loop metadata memo) detect that a marker-protected swap
    * replaced a table between its reads. Folds every direct entry's
    * (name, length, modification time) of each table directory plus the
    * directory's own mtime: a swap renames a freshly-staged `<t>.tmp`
    * over the live dir, so its entries were written at a different time
    * (and usually a different length) than the ones they replaced — the
    * fingerprint changes for ANY committed swap, while appends to OTHER
    * tables (inverted lists, signatures, doclens) leave it untouched.
    * A missing table folds as a sentinel (presence changes — e.g. a
    * PQ-less rebuild deleting `pq/` — also change the value). Pure
    * filesystem metadata: one listing per table, ZERO Spark jobs — the
    * point, since the memo exists to delete per-batch Spark reads.
    */
  def metaFingerprint(fs: FileSystem, dir: String, tables: Seq[String]): Long = {
    var h = 1125899906842597L
    def mix(v: Long): Unit = { h = h * 31 + v }
    tables.foreach { t =>
      val p = new Path(s"$dir/$t")
      if (!fs.exists(p)) mix(-1L)
      else {
        val st = fs.getFileStatus(p)
        mix(st.getModificationTime)
        if (st.isDirectory) fs.listStatus(p).foreach { e =>
          mix(e.getPath.getName.hashCode.toLong)
          mix(e.getLen)
          mix(e.getModificationTime)
        }
      }
    }
    h
  }

  /** Crash recovery for [[commit]] — see the object doc. `postSwap` runs
    * only on roll-forward (marker present).
    */
  def recover(fs: FileSystem, dir: String, markerFile: String,
      tables: Seq[String], op: String)(postSwap: => Unit): Unit = {
    if (!fs.exists(new Path(dir))) return
    val marker = new Path(s"$dir/$markerFile")
    if (fs.exists(marker)) {
      swapStaged(fs, dir, tables, op)
      postSwap
      fs.delete(marker, false)
    } else rollBack(fs, dir, tables, op)
  }
}
