package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.KnnJoinOp

import graft.knn.KnnJoin
import graft.sources.Lake

class KnnPlanSpec extends SparkSpec {

  private lazy val emb = Lake.embeddings(spark, sf0001).cache()

  test("KnnJoinPlan physical operator equals broadcastKnn exactly") {
    GraftFunctions.register(spark)
    val planned = KnnJoinOp.knnJoin(emb, emb, "vec_id", "embedding", 5)
    val got = planned.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val expected = KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
  }

  test("KnnJoinPlan cosine metric and downstream composition") {
    GraftFunctions.register(spark)
    val planned = KnnJoinOp.knnJoin(emb, emb, "vec_id", "embedding", 3, "cosine")
    // the node composes inside a larger plan: filter + agg downstream
    val counts = planned.filter(col("rank") <= 3)
      .groupBy("query_id").count()
    assert(counts.filter(col("count") =!= 3).count() == 0)
    val expected = KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 3,
      KnnJoin.MetricCosine)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = planned.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("SQL TVF: FROM knn_join(...) over temp views equals the Dataset operator") {
    GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_view")
    val viaSql = spark.sql(
      "SELECT query_id, neighbor_id, dist, rank " +
        "FROM knn_join('emb_view', 'emb_view', 'vec_id', 'embedding', 3)")
    val got = viaSql.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val expected = KnnJoinOp.knnJoin(emb, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == expected)
    // composes in plain SQL downstream
    val agg = spark.sql(
      "SELECT query_id, count(*) AS n FROM knn_join('emb_view', 'emb_view', " +
        "'vec_id', 'embedding', 3) GROUP BY query_id")
    assert(agg.filter(col("n") =!= 3).count() == 0)
  }

  test("SQL TVF: bad arguments are rejected with usage errors") {
    GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_view")
    val tooFew = intercept[Exception] {
      spark.sql("SELECT * FROM knn_join('emb_view', 'emb_view', 'vec_id', 'embedding')")
        .collect()
    }
    assert(tooFew.getMessage.contains("knn_join") ||
      tooFew.getCause != null) // usage error surfaces through the analyzer
    val badK = intercept[Exception] {
      spark.sql("SELECT * FROM knn_join('emb_view', 'emb_view', 'vec_id', 'embedding', 'five')")
        .collect()
    }
    assert(badK != null)
  }

  test("SQL TVF: argument errors are AnalysisExceptions naming knn_join and the argument") {
    import org.apache.spark.sql.AnalysisException
    GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_view")
    def analysisError(sql: String): String = {
      val e = intercept[Exception](spark.sql(sql).collect())
      // the analyzer may wrap the builder's error; unwrap to the root
      val root = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).toSeq.last
      assert(root.isInstanceOf[AnalysisException] ||
        e.isInstanceOf[AnalysisException], s"got ${e.getClass}: ${e.getMessage}")
      Option(root.getMessage).getOrElse(e.getMessage)
    }
    // non-boolean 7th arg: previously a raw ClassCastException
    val m1 = analysisError("SELECT * FROM knn_join('emb_view', 'emb_view', " +
      "'vec_id', 'embedding', 2, 'l2sq', 'yes')")
    assert(m1.contains("knn_join") && m1.contains("exclude_self"))
    // non-literal (unfoldable) k — rand() resolves but cannot fold
    val m2 = analysisError("SELECT * FROM knn_join('emb_view', 'emb_view', " +
      "'vec_id', 'embedding', CAST(rand() * 10 AS INT))")
    assert(m2.contains("knn_join") && m2.contains("'k'"))
    // NULL k
    val m3 = analysisError("SELECT * FROM knn_join('emb_view', 'emb_view', " +
      "'vec_id', 'embedding', CAST(NULL AS INT))")
    assert(m3.contains("knn_join") && m3.contains("NULL"))
    // fractional k
    val m4 = analysisError("SELECT * FROM knn_join('emb_view', 'emb_view', " +
      "'vec_id', 'embedding', 2.5)")
    assert(m4.contains("knn_join") && m4.contains("'k'"))
    // boolean literal 7th arg still works
    val ok = spark.sql("SELECT count(*) AS n FROM knn_join('emb_view', 'emb_view', " +
      "'vec_id', 'embedding', 2, 'l2sq', false)").collect().head.getLong(0)
    assert(ok > 0)
  }

  test("SQL TVF: cosine metric argument is honored") {
    GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_view")
    val viaSql = spark.sql(
      "SELECT query_id, neighbor_id FROM knn_join('emb_view', 'emb_view', " +
        "'vec_id', 'embedding', 2, 'cosine')")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 2,
        KnnJoin.MetricCosine)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == expected)
  }

  test("physical plan contains the custom exec node, no cartesian product") {
    GraftFunctions.register(spark)
    val planned = KnnJoinOp.knnJoin(emb, emb, "vec_id", "embedding", 2)
    planned.collect()
    // TreeNode renders KnnJoinExec as "KnnJoin" (Exec suffix stripped)
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("KnnJoin ") || plan.contains("KnnJoin\n") ||
      plan.contains("KnnJoin ["))
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoopJoin"))
  }
}
