package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dist, VectorExpressions}
import graft.sources.Lake

class VectorExprSpec extends SparkSpec {

  private lazy val pairs = {
    val emb = Lake.embeddings(spark, sf0001).limit(50)
    emb.as("a").crossJoin(emb.as("b"))
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
  }

  test("codegen SquaredL2 equals the higher-order-function oracle bit-for-bit") {
    val diff = pairs.select(
      VectorExpressions.squaredL2(col("x"), col("y")).as("fast"),
      Dist.squaredL2(col("x"), col("y")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0)
  }

  test("codegen DotProduct + cosine equals the oracle") {
    val diff = pairs.select(
      VectorExpressions.dotProduct(col("x"), col("y")).as("fast"),
      Dist.dot(col("x"), col("y")).as("slow"))
      .filter(abs(col("fast") - col("slow")) > 1e-12)
    assert(diff.count() == 0)
    val cdiff = pairs.select(
      VectorExpressions.cosineDistance(col("x"), col("y")).as("fast"),
      Dist.cosineDistance(col("x"), col("y")).as("slow"))
      .filter(abs(col("fast") - col("slow")) > 1e-12)
    assert(cdiff.count() == 0)
  }

  test("null inputs and mismatched lengths behave safely") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(1f, 2f, 99f))), // extra element ignored
      (None, Some(Seq(1f, 2f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("x", "y")
    val got = df.select(VectorExpressions.squaredL2(col("x"), col("y")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(0.0), None, Some(0.0)))
  }

  test("SQL registration: squared_l2 / dot_product / normalize_date callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT squared_l2(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                  array(CAST(3.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS d,
        |       dot_product(array(CAST(1.0 AS FLOAT)), array(CAST(4.0 AS FLOAT))) AS p,
        |       normalize_date('2024-Q3') AS nd""".stripMargin).collect().head
    assert(r.getDouble(0) == 8.0)
    assert(r.getDouble(1) == 4.0)
    assert(r.getString(2) == "01 July 2024")
  }

  test("int8 quantization: 4x smaller payload, bounded error, kNN-compatible") {
    import spark.implicits._
    import graft.functions.VectorQuant
    import graft.knn.KnnJoin
    import graft.sources.Lake
    val emb = Lake.embeddings(spark, sf0001).limit(200).cache()
    val q = emb.select(col("vec_id"),
      VectorQuant.quantizeVec(col("embedding")).as("qv"))
    val deq = q.select(col("vec_id"),
      VectorQuant.dequantizeVec(col("qv")).as("embedding")).cache()
    // per-element error bounded by scale/2 = max|x|/254
    val worst = emb.join(deq.withColumnRenamed("embedding", "emb2"), "vec_id")
      .select(array_max(transform(
        arrays_zip(col("embedding"), col("emb2")),
        p => abs(p.getField("embedding") - p.getField("emb2")))).as("err"),
        array_max(transform(col("embedding"), abs(_))).as("maxabs"))
      .select(max(col("err") / (col("maxabs") / 254.0 + 1e-9))).as[Double].head()
    assert(worst <= 1.02, s"quantization error beyond scale/2 bound: $worst")
    // kNN over dequantized vectors recovers most exact neighbors
    val exact = KnnJoin.broadcastKnn(emb, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = KnnJoin.broadcastKnn(deq, deq, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"int8 kNN recall too low: $recall")
    // all-zero vectors survive the round trip
    val z = Seq((1L, Array(0f, 0f))).toDF("id", "v")
      .select(VectorQuant.dequantizeVec(VectorQuant.quantizeVec(col("v"))))
      .as[Array[Float]].head()
    assert(z.toSeq == Seq(0f, 0f))
  }

  test("stopword_count: codegen span, null handling, and hit counting") {
    import org.apache.spark.sql.graft.{Interop, StopwordCount}
    import spark.implicits._
    def cnt(c: org.apache.spark.sql.Column) =
      Interop.column(StopwordCount(Interop.expression(c), Seq("the", "a", "of")))
    val df = Seq(
      Seq("the", "cat", "of", "the"),   // 3 hits (repeats count)
      Seq("dog"),                        // 0 hits
      Seq[String]()                      // empty → 0
    ).toDF("toks").select(cnt(col("toks")).as("n"))
    assert(df.as[Long].collect().toSeq == Seq(3L, 0L, 0L))
    // codegen span needs a real scan under the Project (a literal input is
    // constant-folded away before the physical plan)
    val scanDf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(cnt(split(lower(col("text")), "\\s+")).as("n"))
    scanDf.collect()
    val plan = scanDf.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("stopword_count") && l.contains("*(")))
    // null array propagates null
    val nul = Seq((1, null: Seq[String])).toDF("id", "toks")
      .select(cnt(col("toks"))).collect().head
    assert(nul.isNullAt(0))
  }

  test("plan stays inside whole-stage codegen (no fallback)") {
    val df = pairs.select(VectorExpressions.squaredL2(col("x"), col("y")))
    df.collect() // AQE finalizes the physical plan only on execution
    // the "*(n)" prefix marks a WholeStageCodegen span; the Project holding
    // squared_l2 must carry one (a CodegenFallback expression would not)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("squared_l2") && l.contains("*(")))
  }
}
