package graft

import org.apache.spark.sql.DataFrame

import graft.discover.Eval

/** Metric edge cases (FIXTURES.md §B8): eps-in-denominator, idcg=0,
  * queries without truth, k > |relevant|.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(p: (String, String)*): DataFrame =
    p.toDF("query", "candidate")

  test("perfect retrieval: eps keeps denominators nonzero, rounds to 1.0 at 4dp") {
    val d = pairs("q1" -> "a", "q1" -> "b")
    val m = Eval.microPrf1(d, d).collect().head
    // raw value is 2/(2+1e-8) ≈ 0.999999995; the reference reports round(·,4)
    assert(m.getAs[Double]("precision") == 1.0)
    assert(m.getAs[Double]("f1") == 1.0)
    assert(m.getAs[Long]("tp") == 2 && m.getAs[Long]("fp") == 0)
    // eps also guards the all-empty case: no divide-by-zero, scores 0
    val empty = pairs().limit(0)
    val z = Eval.microPrf1(empty, empty).collect().head
    assert(z.getAs[Double]("f1") == 0.0)
  }

  test("disjoint sets: tp=0, precision=recall=f1=0") {
    val m = Eval.microPrf1(pairs("q1" -> "a"), pairs("q1" -> "b")).collect().head
    assert(m.getAs[Long]("tp") == 0)
    assert(m.getAs[Double]("precision") == 0.0)
    assert(m.getAs[Double]("f1") == 0.0)
  }

  test("NDCG perfect ranking = 1.0; relevant hit at worse rank scores lower") {
    val truth = pairs("q1" -> "a", "q1" -> "b")
    val perfect = Seq(("q1", "a", 1), ("q1", "b", 2), ("q1", "x", 3))
      .toDF("query", "candidate", "rank")
    val worse = Seq(("q1", "x", 1), ("q1", "a", 2), ("q1", "b", 3))
      .toDF("query", "candidate", "rank")
    val n1 = Eval.ndcgAtK(perfect, truth, 3).collect().head.getAs[Double]("ndcg")
    val n2 = Eval.ndcgAtK(worse, truth, 3).collect().head.getAs[Double]("ndcg")
    assert(n1 == 1.0)
    assert(n2 < n1 && n2 > 0)
  }

  test("query with no truth entry: skipped (SemLink) vs scored 0 (DeepJoin)") {
    val ranked = Seq(("q1", "a", 1), ("q2", "z", 1)).toDF("query", "candidate", "rank")
    val truth = pairs("q1" -> "a")
    val semlink = Eval.ndcgAtK(ranked, truth, 5).collect().head
    assert(semlink.getAs[Long]("n_queries") == 1)
    assert(semlink.getAs[Double]("ndcg") == 1.0)
    val deepjoin = Eval.ndcgAtK(ranked, truth, 5, zeroWhenNoTruth = true).collect().head
    assert(deepjoin.getAs[Long]("n_queries") == 2)
    assert(deepjoin.getAs[Double]("ndcg") == 0.5)
  }

  test("truth query with NO retrieved rows scores 0 and stays in the " +
    "mean (both variants)") {
    // retrieval found nothing for q3 — it must drag the mean down, not
    // vanish from n_queries (a system missing half its truth queries
    // would otherwise report perfect NDCG)
    val ranked = Seq(("q1", "a", 1)).toDF("query", "candidate", "rank")
    val truth = pairs("q1" -> "a", "q3" -> "b")
    val semlink = Eval.ndcgAtK(ranked, truth, 5).collect().head
    assert(semlink.getAs[Long]("n_queries") == 2)
    assert(semlink.getAs[Double]("ndcg") == 0.5)
    val deepjoin = Eval.ndcgAtK(ranked, truth, 5, zeroWhenNoTruth = true)
      .collect().head
    assert(deepjoin.getAs[Long]("n_queries") == 2)
    assert(deepjoin.getAs[Double]("ndcg") == 0.5)
  }

  test("retrievedOnly restores reference parity: missed truth queries " +
    "drop from the mean") {
    // both references average NDCG over RETRIEVED queries only
    // (join_discoverer.py groups df_distances by column_1;
    // search_query.py iterates results) — the engine's default keeps
    // missed truth queries at 0 (deliberate divergence, documented on
    // ndcgAtK); retrievedOnly=true is the parity switch
    val ranked = Seq(("q1", "a", 1)).toDF("query", "candidate", "rank")
    val truth = pairs("q1" -> "a", "q3" -> "b")
    val parity = Eval.ndcgAtK(ranked, truth, 5, retrievedOnly = true)
      .collect().head
    assert(parity.getAs[Long]("n_queries") == 1)   // q3 dropped
    assert(parity.getAs[Double]("ndcg") == 1.0)
    // DeepJoin parity: ranked queries with no truth still score 0, but
    // unretrieved truth queries are dropped
    val ranked2 = Seq(("q1", "a", 1), ("q2", "z", 1))
      .toDF("query", "candidate", "rank")
    val dj = Eval.ndcgAtK(ranked2, truth, 5, zeroWhenNoTruth = true,
      retrievedOnly = true).collect().head
    assert(dj.getAs[Long]("n_queries") == 2)       // q1, q2 — not q3
    assert(dj.getAs[Double]("ndcg") == 0.5)
  }

  test("per-query macro metrics (A10): hits, misses, skipped queries") {
    val truth = pairs("q1" -> "a", "q1" -> "b", "q2" -> "z")
    val ranked = Seq(
      ("q1", "a", 1), ("q1", "x", 2), // 1 of 2 relevant retrieved
      ("q2", "z", 1),                  // perfect
      ("q3", "y", 1))                  // no truth → skipped
      .toDF("query", "candidate", "rank")
    val got = Eval.perQueryPrf(ranked, truth, 5).collect()
      .map(r => r.getAs[String]("query") -> r).toMap
    assert(got.keySet == Set("q1", "q2"))
    assert(got("q1").getAs[Long]("tp") == 1)
    assert(got("q1").getAs[Double]("p_at_k") == 0.5)
    assert(got("q1").getAs[Double]("r_at_k") == 0.5)
    assert(got("q2").getAs[Double]("f1_at_k") == 1.0)
  }

  test("k greater than |relevant|: idcg capped at |relevant|") {
    val truth = pairs("q1" -> "a")
    val ranked = Seq(("q1", "a", 1), ("q1", "b", 2)).toDF("query", "candidate", "rank")
    val n = Eval.ndcgAtK(ranked, truth, 5).collect().head.getAs[Double]("ndcg")
    assert(n == 1.0) // dcg = 1/log2(2) = idcg since only one relevant exists
  }
}
