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
