package graft

import org.apache.spark.sql.functions._

import graft.util.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed keys") {
    val skewed = (Seq.fill(500)("hot") ++ Seq("a", "b")).zipWithIndex
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("a", "A"), ("c", "C")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", salt = 4)
      .select("k", "v", "name")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(salted.count(_._1 == "hot") == 500)
  }

  test("salted two-phase aggregation equals plain aggregation") {
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val plain = df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(df, "l_returnflag", "l_quantity", salt = 8)
      .select(col("l_returnflag"), col("n"), round(col("sum_value"), 2).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }
}
