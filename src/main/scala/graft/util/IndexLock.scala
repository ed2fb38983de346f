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
  *    HDFS; on the local FS create(overwrite=false) is check-then-create
  *    and on S3-like stores it is emulated, so the lock degrades to
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

  /** Run `body` holding the writer lock on `dir`; always releases. Throws
    * [[HeldByOther]] (without running `body`) if a live writer holds it.
    */
  def withLock[A](
      spark: SparkSession,
      dir: String,
      op: String,
      staleTtlMs: Long = DefaultStaleTtlMs)(body: => A): A = {
    val held = acquire(spark, dir, op, staleTtlMs)
    try body
    finally release(spark, held)
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

    def tryCreate(): Boolean =
      try {
        val out = fs.create(lockPath, /* overwrite = */ false)
        try out.write(
          s"""{"pid":${ProcessHandle.current().pid()},"host":"${java.net.InetAddress.getLocalHost.getHostName}","op":"$op","token":"$token","acquired_ms":${System.currentTimeMillis()}}
             |""".stripMargin.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: FileAlreadyExistsException => false
        case _: org.apache.hadoop.fs.PathExistsException => false
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
    val holder =
      try {
        val in = fs.open(lockPath)
        try {
          val buf = new Array[Byte](512)
          val n = math.max(0, in.read(buf))
          new String(buf, 0, n, StandardCharsets.UTF_8).trim
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => "<unreadable>" }
    throw new HeldByOther(
      s"IndexLock: $dir is held by another writer ($holder); " +
        s"this ${op} must wait for it to finish (or for the " +
        s"${staleTtlMs / 1000}s stale TTL if it crashed)")
  }

  /** Release a lock returned by [[acquire]]. Idempotent, and FENCED: the
    * file is deleted only if it still carries this acquisition's token —
    * a holder whose lock was TTL-broken mid-op finds a successor's token
    * (or nothing) and leaves the successor's lock alone.
    */
  def release(spark: SparkSession, held: Held): Unit = {
    val fs = held.path.getFileSystem(spark.sessionState.newHadoopConf())
    val mine =
      try {
        val in = fs.open(held.path)
        try {
          val buf = new Array[Byte](512)
          val n = math.max(0, in.read(buf))
          new String(buf, 0, n, StandardCharsets.UTF_8).contains(held.token)
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => false }
    if (mine) {
      try fs.delete(held.path, false)
      catch { case _: java.io.FileNotFoundException => () }
    }
  }
}
