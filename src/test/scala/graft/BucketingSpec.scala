package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.util.Bucketing

class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join without a shuffle exchange") {
    val base = Files.createTempDirectory("buckets").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf0001/lineitem.parquet")

    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4, s"$base/orders_b")
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 4, s"$base/lineitem_b")

    // at sf0.001 Catalyst would broadcast; disable it to exercise the
    // plan shape a fact-to-fact join has at real scale
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, got) = try {
      val joined = Bucketing.readTable(spark, "orders_b")
        .join(Bucketing.readTable(spark, "lineitem_b"), Seq("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val rows = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      (joined.queryExecution.executedPlan.toString, rows)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // the join itself runs on co-located buckets: no shuffle before it —
    // the only exchange allowed is the one feeding the final aggregation
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join over buckets:\n$plan")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not reshuffle its inputs:\n$plan")

    // and the values match the plain parquet join
    val expected = orders
      .join(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
