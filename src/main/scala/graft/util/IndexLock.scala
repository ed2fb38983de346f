package graft.util

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}
import org.apache.spark.sql.SparkSession

/** Best-effort single-writer lock for persistent index maintenance.
  *
  * Every index family in the engine (IVF, HNSW, LSH-dedup, BM25) documents
  * a single-writer maintenance contract: `append` adds files, `vacuum`
  * swaps whole tables via two renames. A concurrent append landing inside
  * a vacuum's swap window writes into `<table>.old` and is silently lost
  * when the old table is deleted. This lock turns that documented contract
  * into an enforced one:
  *
  *  - acquisition is a create-exclusive of `<dir>/_writer.lock` (atomic on
  *    HDFS; on the `file://` scheme Hadoop's create(overwrite=false) is
  *    check-then-create, so the local path dispatches to
  *    `java.io.File.createNewFile` — O_CREAT|O_EXCL, atomic on POSIX;
  *    on S3-like stores exclusivity is emulated, so the lock degrades to
  *    advisory there — hence "best-effort");
  *  - the file carries (pid, host, operation, epoch-millis) for
  *    diagnosability plus a per-acquisition UUID fencing token;
  *  - a lock older than `staleTtlMs` is presumed abandoned by a crashed
  *    writer and is broken — by RENAMING it to a unique tombstone, never
  *    by deleting it in place. Rename arbitrates the break race: of N
  *    contenders that all observed the same stale lock, exactly one
  *    rename succeeds, and nobody ever deletes a lock file that a faster
  *    contender just created (the delete-then-create shape would). The
  *    TTL must exceed the longest legitimate maintenance op, so the
  *    default is generous;
  *  - release is FENCED: it deletes the lock file only while the file
  *    still carries this acquisition's token. A writer that overran the
  *    TTL and had its lock broken therefore cannot release the
  *    successor's lock and admit a third writer (the read-compare-delete
  *    is itself not atomic, but it shrinks the unfenced window from "the
  *    whole overrun" to microseconds and never fires in the common case);
  *  - contention FAILS FAST with [[IndexLock.HeldByOther]] rather than
  *    blocking: maintenance is scheduled work, and the right response to
  *    overlap is "retry later", not a distributed wait queue.
  *
  * The lock serializes WRITERS only. Readers (search/probe) never take it:
  * append is add-files-then-commit (probes see the index before or after,
  * never mid-append) and vacuum's rename swap is atomic per table, so
  * concurrent reads were already safe by the commit protocols.
  */
object IndexLock {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Another writer holds the lock — retry after it finishes. */
  final class HeldByOther(msg: String) extends IllegalStateException(msg)

  val LockFileName = "_writer.lock"

  /** A held acquisition: the lock path plus the fencing token written into
    * the file. [[release]] only deletes while the token still matches.
    */
  final case class Held(path: Path, token: String)

  /** Default stale TTL: 30 min — far beyond any single maintenance op in
    * the suite, small enough that a crashed writer does not brick the
    * index for a day.
    */
  val DefaultStaleTtlMs: Long = 30L * 60 * 1000

  // Single shared daemon thread for lock heartbeats — idle unless a
  // withLock body is running.
  private lazy val heartbeats =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-indexlock-heartbeat")
      t.setDaemon(true)
      t
    })

  /** Run `body` holding the writer lock on `dir`; always releases. Throws
    * [[HeldByOther]] (without running `body`) if a live writer holds it.
    *
    * The lock is HEARTBEATED while `body` runs: a daemon thread touches
    * the lock file's mtime every `staleTtlMs / 4`, so a LIVE writer's
    * lock never ages past the stale TTL no matter how long the op runs
    * (a 100 TB-scale build can legitimately exceed any fixed TTL; without
    * the heartbeat a scheduled append would "break" the still-running
    * build's lock at minute 31 and race its table Overwrites). Only a
    * CRASHED writer's lock stops being touched and ages out — which is
    * exactly what the TTL is for.
    */
  def withLock[A](
      spark: SparkSession,
      dir: String,
      op: String,
      staleTtlMs: Long = DefaultStaleTtlMs)(body: => A): A = {
    val held = acquire(spark, dir, op, staleTtlMs)
    val fs = held.path.getFileSystem(spark.sessionState.newHadoopConf())
    val period = math.max(staleTtlMs / 4, 1000L)
    val warned = new java.util.concurrent.atomic.AtomicBoolean(false)
    // cancel(false) neither interrupts nor waits for an in-flight tick, and
    // the content-rewrite fallback's create(overwrite=true) is not atomic
    // against release's delete — an unsynchronized tick could RESURRECT
    // the lock file (dead token, no heartbeat, no releaser) right after
    // release removed it. Ticks and release therefore share a monitor:
    // release flips `stopped` INSIDE the monitor, which both drains any
    // in-flight tick and makes queued ticks no-op before they touch FS.
    val stopped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val tickGate = new Object
    val beat = heartbeats.scheduleAtFixedRate(
      () => tickGate.synchronized {
        if (!stopped.get) heartbeatOnce(fs, held, warned)
      },
      period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    try body
    finally {
      beat.cancel(false)
      tickGate.synchronized { stopped.set(true) }
      release(spark, held)
    }
  }

  /** One heartbeat tick. `setTimes` is the cheap path (one metadata op);
    * S3A-like stores don't support it, so the failure path (a) WARNS once
    * per hold — a silent no-op would leave operators unaware that the
    * live-writer TTL protection is degraded — and (b) falls back to a
    * token-checked content rewrite, which refreshes mtime on any store
    * that can write at all. The token check keeps a TTL-broken holder
    * from clobbering its successor's lock via the fallback (the
    * read-check-write window is microseconds, vs a whole-TTL silent
    * degradation without the fallback).
    */
  private def heartbeatOnce(
      fs: org.apache.hadoop.fs.FileSystem,
      held: Held,
      warned: java.util.concurrent.atomic.AtomicBoolean): Unit =
    try fs.setTimes(held.path, System.currentTimeMillis(), -1)
    catch {
      case scala.util.control.NonFatal(e) =>
        if (warned.compareAndSet(false, true))
          log.warn(
            s"IndexLock: heartbeat setTimes failed on ${held.path} " +
              s"(${e.getClass.getName}: ${e.getMessage}); falling back to " +
              "token-checked content rewrite — live-writer stale-TTL " +
              "protection is degraded on this store")
        try readWhole(fs, held.path).filter(_.contains(held.token)).foreach {
          s =>
            val out = fs.create(held.path, /* overwrite = */ true)
            try out.write(s.getBytes(StandardCharsets.UTF_8))
            finally out.close()
        } catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Acquire (create-exclusive, breaking a stale holder once) and return
    * the held lock. Prefer [[withLock]]; this exists for callers whose
    * critical section spans non-lexical scope (tests, streaming drivers).
    */
  def acquire(
      spark: SparkSession,
      dir: String,
      op: String,
      staleTtlMs: Long = DefaultStaleTtlMs): Held = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) fs.mkdirs(base)
    val lockPath = new Path(base, LockFileName)
    val token = java.util.UUID.randomUUID().toString

    def payload: String =
      s"""{"pid":${ProcessHandle.current().pid()},"host":"${java.net.InetAddress.getLocalHost.getHostName}","op":"$op","token":"$token","acquired_ms":${System.currentTimeMillis()}}
         |""".stripMargin

    // On the file:// scheme Hadoop's create(overwrite=false) is
    // check-then-create (a lost race double-acquires); java.io's
    // createNewFile is O_CREAT|O_EXCL — truly atomic on POSIX — so the
    // local path dispatches to it. Elsewhere the Hadoop create is the
    // best the store offers (atomic on HDFS, emulated on S3-likes).
    def tryCreate(): Boolean =
      if (fs.getUri.getScheme == "file") {
        val f = new java.io.File(fs.makeQualified(lockPath).toUri.getPath)
        try {
          if (!f.createNewFile()) false
          else
            try {
              java.nio.file.Files.write(f.toPath,
                payload.getBytes(StandardCharsets.UTF_8))
              true
            } catch {
              // payload write failed AFTER the exclusive create: remove
              // the empty file we own, else it sits holder-less (no
              // heartbeat, no release path) and locks everyone out for
              // the full stale TTL
              case e: java.io.IOException => f.delete(); throw e
            }
        } catch { case _: java.io.IOException => false }
      } else {
        val out =
          try fs.create(lockPath, /* overwrite = */ false)
          catch {
            case _: FileAlreadyExistsException => null
            case _: org.apache.hadoop.fs.PathExistsException => null
          }
        if (out == null) false
        else
          try {
            try out.write(payload.getBytes(StandardCharsets.UTF_8))
            finally out.close()
            true
          } catch {
            // payload write failed AFTER the exclusive create succeeded:
            // the file is OURS but holder-less (no token readable, no
            // heartbeat, no release path) — left in place it locks every
            // writer out for the full stale TTL. Best-effort delete and
            // report not-acquired, mirroring the file:// branch; after a
            // successful delete the stale-check below sees the file gone
            // and re-tries the create inline. Only a failed delete (store
            // too broken to remove what it just created) still waits out
            // the TTL.
            case _: java.io.IOException =>
              try fs.delete(lockPath, false)
              catch { case _: java.io.IOException => () }
              false
          }
      }

    if (tryCreate()) return Held(lockPath, token)

    // Holder exists: break it only if provably stale (mtime beyond TTL),
    // and only via rename-to-tombstone so the break race has one winner.
    val stale =
      try {
        val st = fs.getFileStatus(lockPath)
        System.currentTimeMillis() - st.getModificationTime > staleTtlMs
      } catch {
        // holder released between our create attempt and the stat — free
        case _: java.io.FileNotFoundException => true
      }
    if (stale) {
      val tomb = new Path(base, s"$LockFileName.tomb.$token")
      val won =
        try fs.rename(lockPath, tomb)
        catch { case scala.util.control.NonFatal(_) => false }
      if (won) {
        try fs.delete(tomb, false)
        catch { case _: java.io.FileNotFoundException => () }
      }
      // Retry the create whether or not this contender won the rename:
      // the winner's path is now clear; a loser may still slip in ahead
      // of the winner's create — either way exactly one create succeeds
      // and nobody deleted anyone's fresh lock.
      if (tryCreate()) return Held(lockPath, token)
    }
    val holder = readWhole(fs, lockPath).getOrElse("<unreadable>").trim
    throw new HeldByOther(
      s"IndexLock: $dir is held by another writer ($holder); " +
        s"this ${op} must wait for it to finish (or for the " +
        s"${staleTtlMs / 1000}s stale TTL if it crashed)")
  }

  /** Release a lock returned by [[acquire]]. Idempotent, and FENCED: the
    * file is deleted only if it still carries this acquisition's token —
    * a holder whose lock was TTL-broken mid-op finds a successor's token
    * (or nothing) and leaves the successor's lock alone.
    *
    * The fence fails CLOSED on unreadability: if the file EXISTS but
    * cannot be read after retries (degraded object-store IO — exactly
    * the stores where TTL breaks are most likely), the file is KEPT and
    * the decision logged. Deleting on unreadability would let a
    * TTL-overrunning writer destroy its successor's lock precisely when
    * the store is too degraded for the fence to check. The cost of
    * failing closed is bounded: an abandoned unreadable lock stops being
    * heartbeated and ages out at the stale TTL. A file that is simply
    * GONE (the successor already released) needs no action.
    */
  def release(spark: SparkSession, held: Held): Unit = {
    val fs = held.path.getFileSystem(spark.sessionState.newHadoopConf())
    val content = (1 to 3).iterator
      .map(_ => readWhole(fs, held.path))
      .collectFirst { case Some(s) => s }
    content match {
      case Some(s) if s.contains(held.token) =>
        try fs.delete(held.path, false)
        catch { case _: java.io.FileNotFoundException => () }
      case Some(_) => () // a successor's token — fenced out, leave it
      case None =>
        val exists =
          try fs.exists(held.path)
          catch { case scala.util.control.NonFatal(_) => true }
        if (exists)
          log.warn(
            s"IndexLock: ${held.path} exists but is unreadable at release; " +
              "failing CLOSED (keeping the file) — if abandoned it ages " +
              "out at the stale TTL")
    }
  }

  /** Read a small file fully (looping — a single `read` may legally
    * return a partial buffer on chunked stores). None on any failure.
    */
  private def readWhole(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream(512)
        val buf = new Array[Byte](512)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toString(StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
}
