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
  *    HDFS and local FS; on S3-like stores create-exclusive is emulated
  *    and the lock degrades to advisory — hence "best-effort");
  *  - the file carries (pid, host, operation, epoch-millis) for
  *    diagnosability;
  *  - a lock older than `staleTtlMs` is presumed abandoned by a crashed
  *    writer and is broken (deleted, then acquisition retried once) — the
  *    TTL must exceed the longest legitimate maintenance op, so the
  *    default is generous;
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
    val lockPath = acquire(spark, dir, op, staleTtlMs)
    try body
    finally release(spark, lockPath)
  }

  /** Acquire (create-exclusive, breaking a stale holder once) and return
    * the lock path. Prefer [[withLock]]; this exists for callers whose
    * critical section spans non-lexical scope (tests, streaming drivers).
    */
  def acquire(
      spark: SparkSession,
      dir: String,
      op: String,
      staleTtlMs: Long = DefaultStaleTtlMs): Path = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) fs.mkdirs(base)
    val lockPath = new Path(base, LockFileName)

    def tryCreate(): Boolean =
      try {
        val out = fs.create(lockPath, /* overwrite = */ false)
        try out.write(
          s"""{"pid":${ProcessHandle.current().pid()},"host":"${java.net.InetAddress.getLocalHost.getHostName}","op":"$op","acquired_ms":${System.currentTimeMillis()}}
             |""".stripMargin.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: FileAlreadyExistsException => false
        case _: org.apache.hadoop.fs.PathExistsException => false
      }

    if (tryCreate()) return lockPath

    // holder exists: break it only if provably stale (mtime beyond TTL)
    val stale =
      try {
        val st = fs.getFileStatus(lockPath)
        System.currentTimeMillis() - st.getModificationTime > staleTtlMs
      } catch {
        // holder released between our create attempt and the stat — free
        case _: java.io.FileNotFoundException => true
      }
    if (stale) {
      try fs.delete(lockPath, false)
      catch { case _: java.io.FileNotFoundException => () }
      if (tryCreate()) return lockPath
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

  /** Release a lock returned by [[acquire]]. Idempotent. */
  def release(spark: SparkSession, lockPath: Path): Unit = {
    val fs = lockPath.getFileSystem(spark.sessionState.newHadoopConf())
    try fs.delete(lockPath, false)
    catch { case _: java.io.FileNotFoundException => () }
  }
}
