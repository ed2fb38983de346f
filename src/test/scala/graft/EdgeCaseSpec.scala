package graft

import org.apache.spark.sql.functions._

import graft.knn.{ApproxKnn, IvfIndex, KnnJoin}
import graft.sources.Lake
import graft.text.Analysis

/** Edge cases a library user hits first: degenerate sizes, empty inputs,
  * k larger than the candidate side.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Lake.embeddings(spark, sf0001).cache()

  test("kNN with k larger than the candidate count returns all candidates") {
    val tiny = emb.limit(4).cache()
    val got = KnnJoin.broadcastKnn(tiny, tiny, "vec_id", "embedding", k = 10)
    // excludeSelf: each of the 4 queries gets the other 3
    assert(got.groupBy("query_id").count()
      .filter(col("count") =!= 3).count() == 0)
    assert(got.count() == 12)
  }

  test("blockKnn with a block smaller than the data still matches broadcast") {
    val tiny = emb.limit(10).cache()
    val blocked = ApproxKnn.blockKnn(tiny, tiny, "vec_id", "embedding",
        k = 3, blockSize = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val flat = KnnJoin.broadcastKnn(tiny, tiny, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == flat)
  }

  test("cleanCorpus on an empty corpus returns an empty frame, same schema") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Analysis.cleanCorpus(empty, "doc_id", "text")
    assert(out.columns.toSeq == Seq("id", "clean_text"))
    assert(out.count() == 0)
  }

  test("cleanCorpus keeps exactly one canonical row per duplicated text") {
    val docs = Seq(
      (1L, "the cat sat on the mat for a while that day"),
      (2L, "the cat sat on the mat for a while that day"), // dup of 1
      (3L, "ein kleiner deutscher satz ohne englische woerter"),
      (4L, "the quick brown fox is one of the usual examples"))
      .toDF("doc_id", "text")
    val out = Analysis.cleanCorpus(docs, "doc_id", "text",
      minTokens = 3, maxPunctRatio = 0.5, lang = "en")
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 4L)) // dup collapsed to min id; German doc dropped
  }

  test("scrubPii is null-safe and empty-safe") {
    val out = Seq[(Long, String)]((1L, ""), (2L, null))
      .toDF("id", "text")
      .select(Analysis.scrubPii(col("text")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some(""), None))
  }

  test("IvfIndex.search with an empty query side returns an empty frame") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_empty").toString
    IvfIndex.build(emb.limit(20), "vec_id", "embedding", dir, nList = 4)
    val none = IvfIndex.search(spark, dir,
      emb.filter(col("vec_id") < 0), "vec_id", "embedding", k = 3)
    assert(none.count() == 0)
  }

  test("hnswKnn: k beyond candidates, empty partitions, singleton graph") {
    import graft.knn.ApproxKnn
    // 3 candidates over more partitions than rows: some shards are empty,
    // some hold a single node; k exceeds the candidate count
    val tiny = emb.limit(3).repartition(8)
    val out = ApproxKnn.hnswKnn(emb.limit(5), tiny, "vec_id", "embedding",
      k = 10, efSearch = 16, excludeSelf = false)
    val counts = out.groupBy("query_id").count().collect()
      .map(_.getLong(1)).toSet
    assert(counts == Set(3L), "every query must see all 3 candidates")
    // direct graph edge cases
    val g = new graft.knn.HnswGraph(m = 4, efConstruction = 8)
    assert(g.search(Array(0f, 0f), 3, 8).isEmpty, "empty graph yields nothing")
    g.insert(7L, Array(1f, 1f))
    assert(g.search(Array(0f, 0f), 3, 8).map(_._1) == Seq(7L))
  }

  test("BPE truncation degenerate inputs") {
    val bpe = graft.functions.BpeTokenizer.bundled
    assert(bpe.truncate("", 5) == "")
    assert(bpe.truncate("anything", 0) == "")
    assert(bpe.countTokens("   ") == 3)       // one pre-token, three byte tokens
    val noMerges = new graft.functions.BpeTokenizer(Seq.empty)
    assert(noMerges.countTokens("ab cd") == 5) // byte-level fallback [a b Ġc d]
    assert(noMerges.truncate("ab cd", 3) == "ab ")
  }

  test("repetitionStats: null text rows survive as all-zero rows") {
    import spark.implicits._
    val docs = Seq((1L, "a\na"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = graft.text.Analysis.repetitionStats(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(1L, 2L)) // the null row is NOT dropped
    assert(got(1L) == 0.5 && got(2L) == 0.0)
  }

  test("contaminationCheck: null/short texts produce no collisions, no errors") {
    import spark.implicits._
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, null.asInstanceOf[String])).toDF("id", "text")
    val bench = Seq((100L, null.asInstanceOf[String]), (101L, "a b"))
      .toDF("id", "text")
    assert(graft.text.Analysis.contaminationCheck(
      docs, "id", "text", bench, "id", "text").count() == 0)
  }

  test("semanticNearDups: k-means degenerate cases") {
    import spark.implicits._
    // fewer vectors than clusters: nClusters clamps to the sample size
    val tiny = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (3L, Array(0.0f, 5.0f))).toDF("id", "vec")
    val pairs = graft.dedup.Dedup.semanticNearDups(tiny, "id", "vec",
      maxCosineDistance = 1e-6, nClusters = 64, assignProbes = 4)
      .collect()
    // 1 and 2 share a direction exactly; 3 is orthogonal
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    // all-zero input fails loudly instead of training on garbage
    val zeros = Seq((1L, Array(0.0f, 0.0f))).toDF("id", "vec")
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.semanticNearDups(zeros, "id", "vec", 0.5)
    }
  }

  test("pqKnn: k beyond candidates and tiny samples stay well-formed") {
    import spark.implicits._
    val vecs = (0L until 6L).map(i =>
      (i, Array.tabulate(8)(j => (i * 8 + j).toFloat))).toDF("id", "vec")
    val res = graft.knn.ApproxKnn.pqKnn(vecs, vecs, "id", "vec", k = 10,
      m = 4, ksub = 256, rerank = 2)
    // 6 candidates, self excluded → exactly 5 neighbors each, ranks 1..5
    val byQ = res.collect().groupBy(_.getLong(0))
    assert(byQ.size == 6 && byQ.values.forall(_.length == 5))
  }
}
