package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.Lake
import graft.util.IndexLock

/** The single-writer maintenance lock (IndexLock.scala) and its wiring
  * into all four persistent index families: a held lock makes append and
  * vacuum FAIL FAST instead of corrupting a concurrent vacuum's
  * rename-swap window; a stale lock (crashed writer) is broken.
  */
class IndexLockSpec extends SparkSpec {

  private lazy val docs =
    Lake.table(spark, sf0001, "documents").select("doc_id", "text").cache()
  private lazy val emb =
    Lake.table(spark, sf0001, "embeddings").select("vec_id", "embedding").cache()

  private def tempDir(tag: String): String =
    graft.util.TempDirs.register(
      java.nio.file.Files.createTempDirectory(s"idxlock_$tag").toString)

  test("withLock is exclusive, releases on exit, and reports the holder") {
    val dir = tempDir("basic")
    val outer = IndexLock.acquire(spark, dir, "test-holder")
    val e = intercept[IndexLock.HeldByOther] {
      IndexLock.withLock(spark, dir, "late-writer") { fail("must not run") }
    }
    assert(e.getMessage.contains("test-holder"))
    IndexLock.release(spark, outer)
    // released → next writer proceeds, and its lock is gone afterwards
    assert(IndexLock.withLock(spark, dir, "w2") { 42 } == 42)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(dir, IndexLock.LockFileName)))
  }

  test("withLock releases even when the body throws") {
    val dir = tempDir("throwing")
    intercept[RuntimeException] {
      IndexLock.withLock(spark, dir, "boom") { throw new RuntimeException("x") }
    }
    assert(IndexLock.withLock(spark, dir, "after") { 1 } == 1)
  }

  test("a stale lock (beyond TTL) is broken; a fresh one is not") {
    val dir = tempDir("stale")
    val held = IndexLock.acquire(spark, dir, "crashed-writer")
    // age the lock file past a 1ms TTL
    val fs = held.path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.setTimes(held.path, System.currentTimeMillis() - 60000, -1)
    assert(IndexLock.withLock(spark, dir, "breaker", staleTtlMs = 1000) { 7 } == 7)
    // fresh lock with the default TTL still blocks
    val fresh = IndexLock.acquire(spark, dir, "live-writer")
    intercept[IndexLock.HeldByOther] {
      IndexLock.withLock(spark, dir, "blocked") { fail("must not run") }
    }
    IndexLock.release(spark, fresh)
  }

  test("heartbeat: a live withLock holder outlasts its stale TTL unbroken") {
    val dir = tempDir("beat")
    val ttl = 1200L
    @volatile var contenderBlocked = false
    val got = IndexLock.withLock(spark, dir, "long-op", staleTtlMs = ttl) {
      // sleep well past the TTL — the heartbeat (every ttl/4) must keep
      // the lock's mtime fresh so a contender still fails fast instead
      // of "breaking" a live writer
      Thread.sleep(ttl * 2)
      contenderBlocked =
        try {
          IndexLock.withLock(spark, dir, "contender", staleTtlMs = ttl) { () }
          false
        } catch { case _: IndexLock.HeldByOther => true }
      11
    }
    assert(got == 11)
    assert(contenderBlocked,
      "a contender broke a live, heartbeated lock after the TTL elapsed")
    // and after release the next writer proceeds normally
    assert(IndexLock.withLock(spark, dir, "next") { 12 } == 12)
  }

  test("fenced release: a TTL-broken holder cannot delete its successor's lock") {
    val dir = tempDir("fence")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    // writer A acquires, then overruns the TTL (simulated by aging mtime)
    val a = IndexLock.acquire(spark, dir, "slow-writer")
    fs.setTimes(a.path, System.currentTimeMillis() - 60000, -1)
    // writer B breaks the stale lock and becomes the holder
    val b = IndexLock.acquire(spark, dir, "successor", staleTtlMs = 1000)
    // A finishes late and releases — fencing must leave B's lock in place
    IndexLock.release(spark, a)
    assert(fs.exists(new Path(dir, IndexLock.LockFileName)),
      "A's unfenced release deleted B's lock")
    intercept[IndexLock.HeldByOther] {
      IndexLock.withLock(spark, dir, "third-writer") { fail("must not run") }
    }
    // B's own release (matching token) clears it
    IndexLock.release(spark, b)
    assert(!fs.exists(new Path(dir, IndexLock.LockFileName)))
  }

  test("concurrent acquire on the local FS: exactly one winner per round " +
    "(atomic createNewFile, not check-then-create)") {
    val n = 16
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      for (round <- 1 to 5) {
        val dir = tempDir(s"race$round")
        val barrier = new java.util.concurrent.CyclicBarrier(n)
        val futures = (1 to n).map { i =>
          pool.submit(new java.util.concurrent.Callable[Option[IndexLock.Held]] {
            def call(): Option[IndexLock.Held] = {
              barrier.await()
              try Some(IndexLock.acquire(spark, dir, s"racer-$i"))
              catch { case _: IndexLock.HeldByOther => None }
            }
          })
        }
        val held = futures.flatMap(_.get())
        assert(held.size == 1,
          s"round $round: ${held.size} concurrent acquires succeeded")
        IndexLock.release(spark, held.head)
        assert(IndexLock.withLock(spark, dir, "after") { 1 } == 1)
      }
    } finally pool.shutdown()
  }

  test("release fails closed when the lock file exists but is unreadable") {
    val dir = tempDir("failclosed")
    val held = IndexLock.acquire(spark, dir, "degraded-store-writer")
    val fs = held.path.getFileSystem(spark.sessionState.newHadoopConf())
    // make the path exist but be unreadable as a file (a directory of the
    // same name — fs.open throws, every read retry fails)
    fs.delete(held.path, false)
    fs.mkdirs(held.path)
    IndexLock.release(spark, held)
    assert(fs.exists(held.path),
      "release deleted an unreadable lock — the fence failed open")
    fs.delete(held.path, true)
  }

  test("stale break uses rename arbitration: no tombstones or locks leak") {
    val dir = tempDir("tomb")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val crashed = IndexLock.acquire(spark, dir, "crashed")
    fs.setTimes(crashed.path, System.currentTimeMillis() - 60000, -1)
    assert(IndexLock.withLock(spark, dir, "breaker", staleTtlMs = 1000) { 9 } == 9)
    // the break renamed the stale lock to a tombstone and deleted it —
    // the dir must hold neither a lock nor any *.tomb.* remnant
    val leftovers = fs.listStatus(new Path(dir))
      .map(_.getPath.getName)
      .filter(n => n.startsWith(IndexLock.LockFileName))
    assert(leftovers.isEmpty, s"leaked lock artifacts: ${leftovers.toSeq}")
  }

  test("all four index families refuse build under a held lock (build-vs-append contention)") {
    import graft.dedup.LshDedupIndex
    import graft.knn.{HnswIndex, IvfIndex}
    import graft.text.Bm25Index

    val first = docs.filter(col("doc_id") % 2 === 0)
    val embA = emb.filter(col("vec_id") % 2 === 0)
    for ((tag, attempt) <- Seq[(String, String => Any)](
        ("bm25", d => Bm25Index.build(first, "doc_id", "text", d)),
        ("lsh", d => LshDedupIndex.build(first, "doc_id", "text", d)),
        ("ivf", d => IvfIndex.build(embA, "vec_id", "embedding", d, nList = 4)),
        ("hnsw", d => HnswIndex.build(embA, "vec_id", "embedding", d, shards = 2)))) {
      val dir = tempDir(s"build_$tag")
      // simulate an in-flight append holding the writer lock
      val held = IndexLock.acquire(spark, dir, "in-flight-append")
      try {
        intercept[IndexLock.HeldByOther] { attempt(dir) }
      } finally IndexLock.release(spark, held)
      // released → the same build goes through
      attempt(dir)
    }
  }

  test("all four index families refuse append/vacuum under a held lock") {
    import graft.dedup.LshDedupIndex
    import graft.knn.{HnswIndex, IvfIndex}
    import graft.text.Bm25Index

    val first = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 === 1).limit(5)
    val embA = emb.filter(col("vec_id") % 2 === 0)
    val embB = emb.filter(col("vec_id") % 2 === 1).limit(5)

    val bm25Dir = tempDir("bm25")
    val lshDir = tempDir("lsh")
    val ivfDir = tempDir("ivf")
    val hnswDir = tempDir("hnsw")
    Bm25Index.build(first, "doc_id", "text", bm25Dir)
    LshDedupIndex.build(first, "doc_id", "text", lshDir)
    IvfIndex.build(embA, "vec_id", "embedding", ivfDir, nList = 4)
    HnswIndex.build(embA, "vec_id", "embedding", hnswDir, shards = 2)

    for (dir <- Seq(bm25Dir, lshDir, ivfDir, hnswDir)) {
      val held = IndexLock.acquire(spark, dir, "simulated-vacuum")
      try {
        intercept[IndexLock.HeldByOther] {
          dir match {
            case `bm25Dir` => Bm25Index.append(spark, dir, rest, "doc_id", "text")
            case `lshDir` => LshDedupIndex.append(spark, dir, rest, "doc_id", "text")
            case `ivfDir` => IvfIndex.append(spark, dir, embB, "vec_id", "embedding")
            case `hnswDir` => HnswIndex.append(spark, dir, embB, "vec_id", "embedding")
          }
        }
        if (dir != ivfDir) intercept[IndexLock.HeldByOther] {
          dir match {
            case `bm25Dir` => Bm25Index.vacuum(spark, dir)
            case `lshDir` => LshDedupIndex.vacuum(spark, dir)
            case `hnswDir` => HnswIndex.vacuum(spark, dir)
          }
        }
      } finally IndexLock.release(spark, held)
    }

    // after release the same maintenance ops go through
    assert(Bm25Index.append(spark, bm25Dir, rest, "doc_id", "text") == rest.count())
    assert(LshDedupIndex.append(spark, lshDir, rest, "doc_id", "text") == rest.count())
    assert(IvfIndex.append(spark, ivfDir, embB, "vec_id", "embedding") == embB.count())
    assert(HnswIndex.append(spark, hnswDir, embB, "vec_id", "embedding") == embB.count())
    assert(Bm25Index.vacuum(spark, bm25Dir) == 0L)
    assert(LshDedupIndex.vacuum(spark, lshDir) == 0L)
    assert(HnswIndex.vacuum(spark, hnswDir) >= 0)
  }
}
