package graft

import graft.profile.Profiler

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Option("aa"), Option(1.5)),
    (2L, Option("bbb"), None),
    (3L, Option("aa"), Option(22.25)),
    (4L, None, Option(1.5))
  ).toDF("id", "s", "x")

  test("profileStats: counts, nulls, length stats per column") {
    val p = Profiler.profileStats(df, "t").collect()
      .map(r => r.getAs[String]("column") -> r).toMap

    assert(p("s").getAs[Long]("row_count") == 4)
    assert(p("s").getAs[Long]("num_values") == 3)
    assert(p("s").getAs[Long]("nulls") == 1)
    assert(p("s").getAs[Long]("min_len") == 2)
    assert(p("s").getAs[Long]("max_len") == 3)
    assert(p("s").getAs[Double]("avg_len") == 2.33) // round(7/3, 2)

    assert(p("x").getAs[Long]("nulls") == 1)
    assert(p("id").getAs[String]("inferred_type") == "integer")
    assert(p("x").getAs[String]("inferred_type") == "float")
    assert(p("s").getAs[String]("inferred_type") == "string")
  }

  test("dotted column names profile instead of failing struct resolution") {
    // col("user.id") parses as struct access — every data-derived
    // reference must be backtick-quoted for a legal parquet name like this
    val dotted = Seq(("x", 1), ("yy", 2), (null, 3))
      .toDF("user.id", "row.num")
    val p = Profiler.profileTable(dotted, "t").collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p("user.id").getAs[Long]("num_values") == 2)
    assert(p("user.id").getAs[Long]("nulls") == 1)
    assert(p("user.id").getAs[Long]("max_len") == 2)
    assert(p("user.id").getAs[scala.collection.Seq[String]]("values_sample")
      .toSeq == Seq("x", "yy"))
  }

  test("profileTable: first-seen distinct sample and top-K most-common") {
    val p = Profiler.profileTable(df, "t", sampleSize = 2, topK = 1).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    // first-seen distinct order for s: aa (rid 0), bbb (rid 1); cap 2
    assert(p("s").getAs[scala.collection.Seq[String]]("values_sample").toSeq == Seq("aa", "bbb"))
    // top-1 by frequency: aa (2 occurrences)
    assert(p("s").getAs[scala.collection.Seq[String]]("most_common_values").toSeq == Seq("aa"))
  }

  test("row_count equals table count for every column") {
    val lake = Profiler.profileStats(
      spark.read.parquet(s"$sf0001/nation.parquet"), "nation")
    assert(lake.collect().forall(_.getAs[Long]("row_count") == 25))
  }

  test("bounded_topk is callable from SQL and keeps (key, value) order") {
    GraftFunctions.register(spark)
    Seq(("a", 3L, "x"), ("a", 1L, "y"), ("a", 2L, "z"), ("b", 5L, "q"))
      .toDF("g", "k", "v").createOrReplaceTempView("btk_in")
    val got = spark.sql(
      "SELECT g, bounded_topk(k, v, 2) AS top FROM btk_in GROUP BY g")
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[String]]("top").toSeq).toMap
    assert(got("a") == Seq("y", "z")) // keys 1, 2 win; 3 evicted
    assert(got("b") == Seq("q"))
  }
}
