package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeTokenizer, TextFns, VectorExpressions}

/** The SQL registration surface: every registered function must answer
  * identically to its Column-API twin.
  */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def sql1[T](q: String): T = {
    GraftFunctions.register(spark)
    spark.sql(q).collect().head.getAs[T](0)
  }

  test("bpe_token_count / bpe_truncate run the bundled tokenizer from SQL") {
    assert(sql1[Long]("SELECT bpe_token_count('the theme')") ==
      BpeTokenizer.bundled.countTokens("the theme"))
    assert(sql1[String]("SELECT bpe_truncate('the theme', 2)") == "the the")
  }

  test("minhash_sig / simhash64 equal the Column API") {
    GraftFunctions.register(spark)
    val df = Seq("the quick brown fox jumps over it").toDF("t")
    df.createOrReplaceTempView("sig_in")
    val kernel = new org.apache.spark.sql.graft.MinHashKernel(3, 16)
    val viaCol = df.select(
      VectorExpressions.minhashSig(col("t"), kernel).as("mh"),
      VectorExpressions.simhash64(col("t")).as("sh")).collect().head
    val viaSql = spark.sql(
      "SELECT minhash_sig(t, 3, 16) AS mh, simhash64(t) AS sh FROM sig_in")
      .collect().head
    assert(viaSql.getAs[scala.collection.Seq[Int]]("mh") ==
      viaCol.getAs[scala.collection.Seq[Int]]("mh"))
    assert(viaSql.getAs[Long]("sh") == viaCol.getAs[Long]("sh"))
  }

  test("winnow_fingerprints normalizes and fingerprints like the Column API") {
    GraftFunctions.register(spark)
    val df = Seq("  Shared   PASSAGE of text here  ").toDF("t")
    df.createOrReplaceTempView("win_in")
    val viaCol = df.select(
      graft.text.Analysis.winnowingFingerprint(col("t"), 4, 2))
      .collect().head.getAs[scala.collection.Seq[Long]](0)
    val viaSql = spark.sql("SELECT winnow_fingerprints(t, 4, 2) FROM win_in")
      .collect().head.getAs[scala.collection.Seq[Long]](0)
    assert(viaSql == viaCol && viaSql.nonEmpty)
  }

  test("non-literal int arguments raise a clean AnalysisException, not an eval error") {
    GraftFunctions.register(spark)
    Seq("x").toDF("t").withColumn("n", lit(2)).createOrReplaceTempView("lit_in")
    for (q <- Seq(
        "SELECT bpe_truncate(t, n) FROM lit_in",          // column ref
        "SELECT minhash_sig(t, n, 16) FROM lit_in",
        "SELECT winnow_fingerprints(t, 4, n) FROM lit_in")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(q).collect())
      assert(e.getMessage.contains("foldable integer literal"), s"$q → ${e.getMessage}")
    }
  }

  test("normalize_date and squared_l2 still answer from SQL after re-registration") {
    assert(sql1[String]("SELECT normalize_date('2024-03')") == "01 March 2024")
    assert(sql1[Double](
      "SELECT squared_l2(array(1.0f, 2.0f), array(1.0f, 4.0f))") == 4.0)
  }
}
