package graft

import org.apache.spark.sql.functions._

import graft.knn.{IvfIndex, KnnJoin}
import graft.sources.Lake

class IvfIndexSpec extends SparkSpec {

  private lazy val emb = Lake.embeddings(spark, sf0001).cache()

  private def exactTop5 = KnnJoin
    .broadcastKnn(emb, emb, "vec_id", "embedding", 5)
    .select("query_id", "neighbor_id").collect()
    .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("persisted index probed at nProbe=nList equals brute force") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val nUsed = IvfIndex.build(emb, "vec_id", "embedding", dir, nList = 8)
    assert(nUsed == 8)
    val got = IvfIndex
      .search(spark, dir, emb, "vec_id", "embedding", k = 5, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactTop5)
  }

  test("pruned probe reads only the probed list partitions, recall holds") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx2").toString
    IvfIndex.build(emb, "vec_id", "embedding", dir, nList = 8)
    // single-query search: few probes → few partitions
    val oneQuery = emb.filter(col("vec_id") === 0)
    val res = IvfIndex.search(spark, dir, oneQuery, "vec_id", "embedding",
      k = 5, nProbe = 2)
    val rows = res.collect()
    assert(rows.length == 5)
    // the assignments scan carries a static partition filter on cid —
    // unprobed inverted lists are pruned at file-listing level
    val plan = res.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("assignments"))
    assert(scanLine.isDefined)
    assert(scanLine.get.contains("PartitionFilters: [cid#") ||
      scanLine.get.contains("cid IN") || plan.contains("PartitionFilters"),
      s"no partition filter on the assignments scan:\n$plan")
    // full-corpus pruned search keeps a sane recall floor
    val pruned = IvfIndex.search(spark, dir, emb, "vec_id", "embedding",
      k = 5, nProbe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pruned.intersect(exactTop5).size.toDouble / exactTop5.size
    assert(recall > 0.5, s"pruned recall too low: $recall")
  }

  test("append without retrain: build(half) + append(rest) ≡ build(all)") {
    import spark.implicits._
    val first = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dirInc = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    val dirAll = java.nio.file.Files.createTempDirectory("ivf_all").toString
    // same sampled training set on both sides: train on the SAME half so
    // the coarse quantizers are identical, then append the other half
    val nInc = IvfIndex.build(first, "vec_id", "embedding", dirInc, nList = 8)
    val appended = IvfIndex.append(spark, dirInc, rest, "vec_id", "embedding")
    assert(appended == rest.count())
    IvfIndex.build(first, "vec_id", "embedding", dirAll, nList = 8)
    IvfIndex.append(spark, dirAll, rest, "vec_id", "embedding")
    // the incremental index holds every vector exactly once
    val stored = spark.read.parquet(s"$dirInc/assignments")
    assert(stored.count() == emb.count())
    assert(stored.select("id").distinct().count() == emb.count())
    // probed at nProbe=nList, search over the appended index is EXACT
    val got = IvfIndex
      .search(spark, dirInc, emb, "vec_id", "embedding", k = 5, nProbe = nInc)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactTop5)
    // appended rows landed in the same cid partitions the quantizer assigns
    val cidOf = spark.read.parquet(s"$dirAll/assignments")
      .select("id", "cid").as[(Long, Int)].collect().toMap
    val cidInc = stored.select("id", "cid").as[(Long, Int)].collect().toMap
    assert(cidInc == cidOf)
  }

  test("cosine index: metric rides the index, search equals brute-force cosine") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_cos").toString
    val nUsed = IvfIndex.build(emb, "vec_id", "embedding", dir, nList = 8,
      metric = KnnJoin.MetricCosine)
    // search takes NO metric argument — cosine must come back from params/
    val got = IvfIndex
      .search(spark, dir, emb, "vec_id", "embedding", k = 5, nProbe = nUsed)
      .select("query_id", "neighbor_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = KnnJoin
      .broadcastKnn(emb, emb, "vec_id", "embedding", 5, KnnJoin.MetricCosine)
      .select("query_id", "neighbor_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // same pairs AND the same true-cosine distances (both sides compute
    // dot/norms in double on the original vectors — not normalized-L2/2)
    assert(got.map(t => (t._1, t._2)).toSet == exact.map(t => (t._1, t._2)).toSet)
    val exactDist = exact.map(t => (t._1, t._2) -> t._3).toMap
    got.foreach { case (q, n, d) =>
      assert(math.abs(d - exactDist((q, n))) < 1e-12,
        s"cosine distance drift for ($q,$n)")
    }
  }

  test("cosine index: append assigns under the persisted metric, stays exact") {
    val first = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("ivf_cos_app").toString
    val n = IvfIndex.build(first, "vec_id", "embedding", dir, nList = 8,
      metric = KnnJoin.MetricCosine)
    IvfIndex.append(spark, dir, rest, "vec_id", "embedding")
    val got = IvfIndex
      .search(spark, dir, emb, "vec_id", "embedding", k = 5, nProbe = n)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactCos = KnnJoin
      .broadcastKnn(emb, emb, "vec_id", "embedding", 5, KnnJoin.MetricCosine)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactCos)
  }

  test("legacy pre-params index reads as squared-L2") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_legacy").toString
    IvfIndex.build(emb, "vec_id", "embedding", dir, nList = 8)
    // simulate an index persisted before params/ existed
    val deleted = new java.io.File(s"$dir/params")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(deleted)
    val got = IvfIndex
      .search(spark, dir, emb, "vec_id", "embedding", k = 5, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactTop5)
  }

  test("index survives a fresh read: search works from paths alone") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx3").toString
    IvfIndex.build(emb, "vec_id", "embedding", dir, nList = 4)
    // no handle carried over — the directory IS the index
    val res = IvfIndex.search(spark, dir, emb.limit(10), "vec_id", "embedding",
      k = 3, nProbe = 4)
    assert(res.groupBy("query_id").count()
      .filter(col("count") =!= 3).count() == 0)
  }
}
