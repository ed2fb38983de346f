package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.knn.{ApproxKnn, KnnJoin}
import graft.sources.Lake

class ApproxKnnSpec extends SparkSpec {

  private lazy val emb = Lake.embeddings(spark, sf0001).cache()

  private lazy val exactPairs: Map[Long, Set[Long]] =
    KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallAt5(approx: DataFrame): Double = {
    val got = approx.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hits = exactPairs.map { case (q, truth) =>
      got.get(q).map(g => (g intersect truth).size).getOrElse(0)
    }.sum
    hits.toDouble / (exactPairs.size * 5)
  }

  test("LSH kNN: deterministic, well-formed, recall@5 above floor") {
    val a1 = ApproxKnn.lshKnn(emb, emb, "vec_id", "embedding", k = 5, dim = 64)
    val a2 = ApproxKnn.lshKnn(emb, emb, "vec_id", "embedding", k = 5, dim = 64)
    assert(a1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      a2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(a1.filter(col("query_id") === col("neighbor_id")).count() == 0)
    assert(a1.filter(col("rank") > 5).count() == 0)
    val r = recallAt5(a1)
    assert(r > 0.4, s"LSH recall@5 too low: $r")
  }

  test("IVF kNN: recall@5 above floor and ranks well-formed") {
    val a = ApproxKnn.ivfKnn(emb, emb, "vec_id", "embedding", k = 5,
      nList = 16, nProbe = 6)
    assert(a.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val r = recallAt5(a)
    assert(r > 0.55, s"IVF recall@5 too low: $r")
  }

  test("IVF cosine (spherical): recall@5 vs exact cosine kNN") {
    val exactCos = KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 5,
        KnnJoin.MetricCosine)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def recall(a: org.apache.spark.sql.DataFrame): Double = {
      val got = a.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      exactCos.map { case (q, t) =>
        got.get(q).map(g => (g intersect t).size).getOrElse(0)
      }.sum.toDouble / (exactCos.size * 5)
    }
    // probing every list = brute force over unit vectors: ranking equals
    // exact cosine up to float rounding at ties
    val full = recall(ApproxKnn.ivfKnn(emb, emb, "vec_id", "embedding", 5,
      nList = 16, nProbe = 16, metric = KnnJoin.MetricCosine))
    assert(full > 0.95, s"spherical IVF full-probe recall too low: $full")
    val pruned = recall(ApproxKnn.ivfKnn(emb, emb, "vec_id", "embedding", 5,
      nList = 16, nProbe = 6, metric = KnnJoin.MetricCosine))
    assert(pruned > 0.5, s"spherical IVF pruned recall too low: $pruned")
    // dist is true cosine distance: bounded in [0, 2]
    val ds = ApproxKnn.ivfKnn(emb, emb, "vec_id", "embedding", 3,
        nList = 16, nProbe = 16, metric = KnnJoin.MetricCosine)
      .select(min("dist"), max("dist")).collect().head
    assert(ds.getDouble(0) >= 0.0 && ds.getDouble(1) <= 2.0 + 1e-9)
  }

  test("IVF probing more lists improves recall monotonically-ish") {
    val r1 = recallAt5(ApproxKnn.ivfKnn(emb, emb, "vec_id", "embedding", 5,
      nList = 16, nProbe = 1))
    val r4 = recallAt5(ApproxKnn.ivfKnn(emb, emb, "vec_id", "embedding", 5,
      nList = 16, nProbe = 4))
    val rAll = recallAt5(ApproxKnn.ivfKnn(emb, emb, "vec_id", "embedding", 5,
      nList = 16, nProbe = 16))
    assert(r1 <= r4 + 1e-9 && r4 <= rAll + 1e-9)
    assert(rAll > 0.99, s"probing every list must equal exact, got $rAll")
  }

  test("HNSW kNN: deterministic, well-formed, recall@5 above floor") {
    val a1 = ApproxKnn.hnswKnn(emb, emb, "vec_id", "embedding", k = 5)
    val a2 = ApproxKnn.hnswKnn(emb, emb, "vec_id", "embedding", k = 5)
    assert(a1.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet ==
      a2.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet)
    assert(a1.filter(col("query_id") === col("neighbor_id")).count() == 0)
    assert(a1.filter(col("rank") > 5).count() == 0)
    // every query present with exactly k ranked neighbors
    assert(a1.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    val r = recallAt5(a1)
    assert(r > 0.8, s"HNSW recall@5 too low: $r")
  }

  test("HNSW: wider beam improves recall monotonically-ish") {
    val r8 = recallAt5(ApproxKnn.hnswKnn(emb, emb, "vec_id", "embedding", 5,
      efSearch = 8))
    val r64 = recallAt5(ApproxKnn.hnswKnn(emb, emb, "vec_id", "embedding", 5,
      efSearch = 64))
    assert(r8 <= r64 + 0.02, s"ef=8 recall $r8 vs ef=64 recall $r64")
    assert(r64 > 0.8)
  }

  test("HNSW cosine metric agrees with exact cosine kNN above floor") {
    val exactCos = KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 5,
        KnnJoin.MetricCosine)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val got = ApproxKnn.hnswKnn(emb, emb, "vec_id", "embedding", 5,
        metric = KnnJoin.MetricCosine)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hits = exactCos.map { case (q, truth) =>
      got.get(q).map(g => (g intersect truth).size).getOrElse(0)
    }.sum
    val r = hits.toDouble / (exactCos.size * 5)
    assert(r > 0.8, s"HNSW cosine recall@5 too low: $r")
  }

  test("blockKnn equals broadcastKnn across block boundaries") {
    val whole = KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blocked = ApproxKnn.blockKnn(emb, emb, "vec_id", "embedding", 3,
      blockSize = 150)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == whole)
  }

  test("blockKnn survives degenerate quantile cuts (empty edge blocks skipped)") {
    // blockSize=1 over 10 ids: the lowest quantile cut lands ON the
    // minimum id, so the first half-open block (None, min) holds no ids
    // at all — the exact shape large-n quantile rank error produces at
    // scale. Skipping the empty block must be exact: the result still
    // equals the single-broadcast answer.
    import spark.implicits._
    val tiny = (1 to 10)
      .map(i => (i.toLong, Array.tabulate(4)(j => ((i * 13 + j) % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val whole = KnnJoin.broadcastKnn(tiny, tiny, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blocked = ApproxKnn.blockKnn(tiny, tiny, "vec_id", "embedding", 3,
        blockSize = 1)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == whole)
  }

  test("blockKnn drops null-id queries identically in both paths; " +
    "all-null fails loudly") {
    import spark.implicits._
    val vecs = (1 to 12)
      .map(i => (i.toLong, Array.tabulate(4)(j => ((i * 13 + j) % 7).toFloat)))
    val withNulls = (vecs.map { case (id, v) => (Some(id), v) } :+
      ((Option.empty[Long], Array(1f, 2f, 3f, 4f)))).toDF("vec_id", "embedding")
    val clean = vecs.toDF("vec_id", "embedding")
    val want = KnnJoin.broadcastKnn(clean, clean, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // null-id queries drop in the SINGLE-block path (used to NPE in
    // Dataset decoding) and in the multi-block path alike
    Seq(100, 2).foreach { bs =>
      val got = ApproxKnn.blockKnn(withNulls, clean, "vec_id", "embedding",
          3, blockSize = bs)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"blockSize=$bs")
    }
    // every id null: the loud empty-query contract, not an opaque
    // empty.reduce or NPE
    val allNull = Seq((Option.empty[Long], Array(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      ApproxKnn.blockKnn(allNull, clean, "vec_id", "embedding", 3)
    }
    assert(e.getMessage.contains("empty query side"))
  }

  test("pqKnn on an all-zero cosine corpus follows the distance-1.0 " +
    "convention instead of failing (the ivfKnn contract)") {
    import spark.implicits._
    val zeros = (1 to 6)
      .map(i => (i.toLong, Array.fill(8)(0f))).toDF("vec_id", "embedding")
    val got = ApproxKnn.pqKnn(zeros, zeros, "vec_id", "embedding", k = 2,
      metric = KnnJoin.MetricCosine, m = 4, rerank = 0)
    val rows = got.select("query_id", "dist").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) == 1.0,
      s"zero-vector pair scored ${r.getDouble(1)}, not the 1.0 convention"))
  }

  test("driver kmeans seeds from distinct vectors: duplicate-heavy " +
    "samples do not collapse the effective list count") {
    val a = Array(0f, 0f); val b = Array(10f, 10f); val c = Array(-10f, 5f)
    // 30 copies of three distinct points; nList=3 must seed three
    // DISTINCT centroids (pre-fix, a duplicate-heavy shuffle could seed
    // the same point twice — ties assign to the lowest index and the
    // clone never receives rows)
    val sample = Array.tabulate(30)(i => Seq(a, b, c)(i % 3).clone())
    val centroids = ApproxKnn.kmeans(sample, nList = 3, iters = 5, seed = 1)
    assert(centroids.length == 3)
    assert(centroids.map(_.toSeq).toSet.size == 3, "duplicate centroids")
    // asking for more lists than distinct vectors yields the distinct
    // count (the KMeans.train contract), not padded duplicates
    assert(ApproxKnn.kmeans(sample, nList = 10, iters = 3, seed = 1)
      .length == 3)
  }

  test("blockKnn: ≥32 blocks takes the chunked-checkpoint fold, bounded lineage") {
    // 80 ids at blockSize=2 forces ~40 blocks — past the 32-block chunk
    // where unionChunked starts checkpointing — so this exercises BOTH
    // the eager chunk materialization and the cross-chunk union. Results
    // must still be rank-exact vs one broadcast, and the final plan must
    // be a shallow union of checkpointed leaves, not a 40-deep Union.
    import spark.implicits._
    val many = (1 to 80)
      .map(i => (i.toLong, Array.tabulate(4)(j => ((i * 13 + j) % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val whole = KnnJoin.broadcastKnn(many, many, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val blockedDf = ApproxKnn.blockKnn(many, many, "vec_id", "embedding", 3,
      blockSize = 2)
    val unions = blockedDf.queryExecution.analyzed.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.size
    assert(unions <= 4,
      s"expected a shallow post-checkpoint plan, found $unions Union nodes")
    val blocked = blockedDf
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blocked == whole)
  }

  test("truncatedKnn: full-dim degenerates to exact; dist is full-dim") {
    val full = ApproxKnn.truncatedKnn(emb, emb, "vec_id", "embedding",
        k = 5, truncDim = 64)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact)
    // reported distances are exact full-dimension values even when the
    // candidate stage saw only a prefix
    val truncated = ApproxKnn.truncatedKnn(emb, emb, "vec_id", "embedding",
      k = 5, truncDim = 32)
    val withExact = truncated.join(
      KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 500)
        .select(col("query_id"), col("neighbor_id"),
          col("dist").as("__exact")),
      Seq("query_id", "neighbor_id"))
    assert(withExact.filter(abs(col("dist") - col("__exact")) > 1e-9)
      .count() == 0)
  }

  test("truncatedKnn: recall floor at half dim; wider rerank helps") {
    // raw random embeddings: prefix energy is proportional, so the
    // measured operating points are ~0.49 (32 dims, 4k list) and ~0.93
    // (48 dims, 8k list) — floors sit under each with margin
    val r4 = recallAt5(ApproxKnn.truncatedKnn(emb, emb, "vec_id",
      "embedding", k = 5, truncDim = 32, rerank = 4))
    assert(r4 > 0.4, s"truncated recall@5 too low: $r4")
    val r48 = recallAt5(ApproxKnn.truncatedKnn(emb, emb, "vec_id",
      "embedding", k = 5, truncDim = 48, rerank = 8))
    assert(r48 > 0.8, s"48-dim truncated recall@5 too low: $r48")
    val r12 = recallAt5(ApproxKnn.truncatedKnn(emb, emb, "vec_id",
      "embedding", k = 5, truncDim = 32, rerank = 12))
    assert(r12 >= r4 - 0.02, s"wider rerank regressed recall: $r4 -> $r12")
  }

  test("hnswBlockKnn scratch guard: the owned driver-local default is " +
    "refused off local masters, allowed locally or with a caller dir") {
    // local master, owned default: fine (this suite's own mode)
    ApproxKnn.requireLocalScratch("local[32]", owned = true)
    // non-local master with a CALLER-provided shared dir: fine
    ApproxKnn.requireLocalScratch("yarn", owned = false)
    // non-local master falling back to driver temp: refused loudly —
    // executors would write graphs to a path only the driver can see
    val e = intercept[IllegalArgumentException] {
      ApproxKnn.requireLocalScratch("spark://host:7077", owned = true)
    }
    assert(e.getMessage.contains("shared-filesystem scratchDir"),
      s"guard message changed: ${e.getMessage}")
  }
}
