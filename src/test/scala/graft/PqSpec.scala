package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.knn.{ApproxKnn, KnnJoin, Pq}
import graft.sources.Lake

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Lake.embeddings(spark, sf0001).cache()

  private def exactTop5(metric: String): Map[Long, Set[Long]] =
    KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 5, metric)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallAt5(approx: DataFrame, truth: Map[Long, Set[Long]]): Double = {
    val got = approx.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    truth.map { case (q, t) =>
      got.get(q).map(g => (g intersect t).size).getOrElse(0)
    }.sum.toDouble / (truth.size * 5)
  }

  test("PqCodebooks: train invariants and ADC table arithmetic") {
    val rnd = new scala.util.Random(7)
    val sample = Array.fill(100)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val cb = Pq.train(sample, m = 4, ksub = 8, iters = 5, seed = 1)
    assert(cb.m == 4 && cb.dsub == 4 && cb.ksub == 8 && cb.dim == 16)

    // ADC of (code(v), lut(q)) must equal the hand-computed sum over
    // subspaces of ||q_s - centroid_{code_s}||² — independent arithmetic
    val v = sample(0)
    val q = sample(1)
    val code = cb.encode(new org.apache.spark.sql.catalyst.util.GenericArrayData(v))
    val lut = cb.adcTable(q)
    val byHand = (0 until 4).map { s =>
      val c = cb.centroids(s)(code(s) & 0xff)
      (0 until 4).map { i =>
        val x = (q(s * 4 + i) - c(i)).toDouble; x * x
      }.sum.toFloat.toDouble
    }.sum
    val adc = cb.adcDist(code, lut)
    assert(math.abs(adc - byHand) < 1e-6, s"adc=$adc hand=$byHand")

    // a vector's distance to its own code is the quantization error —
    // strictly smaller than its ADC distance to a far-away point
    val selfD = cb.adcDist(code, cb.adcTable(v))
    assert(selfD >= 0.0 && selfD < adc)
  }

  test("Pq.train rejects non-divisible dims and clamps ksub to the sample") {
    val distinct = Array.tabulate(10)(i => Array.fill(16)(i.toFloat))
    intercept[IllegalArgumentException](Pq.train(distinct, m = 5))
    val cb = Pq.train(distinct, m = 4, ksub = 256)
    assert(cb.ksub == 10) // clamped to the sample size
    // an all-identical sample collapses to ONE honest centroid per
    // subspace (kmeans seeds from distinct vectors), not ten copies
    val dupes = Array.fill(10)(Array.fill(16)(1.0f))
    assert(Pq.train(dupes, m = 4, ksub = 256).ksub == 1)
  }

  test("pqKnn with rerank: recall@5 above floor, well-formed, deterministic") {
    val truth = exactTop5(KnnJoin.MetricL2Sq)
    val a = ApproxKnn.pqKnn(emb, emb, "vec_id", "embedding", k = 5,
      m = 16, ksub = 256, rerank = 4)
    assert(a.filter(col("query_id") === col("neighbor_id")).count() == 0)
    assert(a.filter(col("rank") > 5).count() == 0)
    assert(a.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    val r = recallAt5(a, truth)
    assert(r > 0.8, s"PQ+rerank recall@5 too low: $r")
    val again = ApproxKnn.pqKnn(emb, emb, "vec_id", "embedding", k = 5,
      m = 16, ksub = 256, rerank = 4)
    assert(a.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      again.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("pqKnn rerank re-scores with EXACT distances on the short list") {
    // every (q, n, dist) in the reranked output must agree bit-for-bit
    // with the brute-force distance for that pair
    val exact = KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 50)
      .select("query_id", "neighbor_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val a = ApproxKnn.pqKnn(emb, emb, "vec_id", "embedding", k = 5,
      m = 16, ksub = 256, rerank = 4).collect()
    a.foreach { row =>
      val key = (row.getLong(0), row.getLong(1))
      exact.get(key).foreach { d =>
        assert(math.abs(row.getDouble(2) - d) < 1e-9,
          s"reranked dist for $key diverges: ${row.getDouble(2)} vs $d")
      }
    }
  }

  test("pqKnn rerank=0 returns raw ADC distances, still a useful ranking") {
    val truth = exactTop5(KnnJoin.MetricL2Sq)
    val a = ApproxKnn.pqKnn(emb, emb, "vec_id", "embedding", k = 5,
      m = 16, ksub = 256, rerank = 0)
    val r = recallAt5(a, truth)
    assert(r > 0.5, s"raw ADC recall@5 too low: $r")
  }

  test("pqBlockKnn at ≥3 blocks equals the single-broadcast pqKnn") {
    // same candidate-side sample → same codebooks → identical ADC
    // distances; blocking touches only WHICH queries ride each broadcast,
    // so the blocked result must match pqKnn pair-for-pair
    val single = ApproxKnn.pqKnn(emb, emb, "vec_id", "embedding", k = 5,
      m = 16, ksub = 256, rerank = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blockSize = math.max(1L, emb.count() / 3).toInt
    val blocked = ApproxKnn.pqBlockKnn(emb, emb, "vec_id", "embedding", k = 5,
      m = 16, ksub = 256, rerank = 4, blockSize = blockSize)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == single)
    // and the q57 recall contract holds on the blocked path directly
    val truth = exactTop5(KnnJoin.MetricL2Sq)
    val a = ApproxKnn.pqBlockKnn(emb, emb, "vec_id", "embedding", k = 5,
      m = 16, ksub = 256, rerank = 4, blockSize = blockSize)
    val r = recallAt5(a, truth)
    assert(r > 0.8, s"blocked PQ recall@5 too low: $r")
  }

  test("pqBlockKnn single-block degenerates to pqKnn") {
    val a = ApproxKnn.pqBlockKnn(emb, emb, "vec_id", "embedding", k = 5,
      m = 16, ksub = 256, rerank = 4, blockSize = Int.MaxValue)
    assert(a.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
  }

  test("pqKnn cosine: spherical ADC with rerank tracks exact cosine kNN") {
    val truth = exactTop5(KnnJoin.MetricCosine)
    val a = ApproxKnn.pqKnn(emb, emb, "vec_id", "embedding", k = 5,
      KnnJoin.MetricCosine, m = 16, ksub = 256, rerank = 4)
    val r = recallAt5(a, truth)
    assert(r > 0.8, s"PQ cosine recall@5 too low: $r")
    // reranked cosine distances live in the metric's range
    val ds = a.select("dist").collect().map(_.getDouble(0))
    assert(ds.forall(d => d >= -1e-9 && d <= 2.0 + 1e-9))
  }
}
