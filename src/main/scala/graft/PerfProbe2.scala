package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dates.DateNorm
object PerfProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("warm-scan")(o.count())
    val m = col("o_orderkey") % 4
    val raw = when(m === 0, date_format(col("o_orderdate"), "yyyy-MM"))
      .when(m === 1, date_format(col("o_orderdate"), "yyyyMMdd"))
      .when(m === 2, date_format(col("o_orderdate"), "MM/yyyy"))
      .otherwise(concat(year(col("o_orderdate")), lit("-Q"), quarter(col("o_orderdate"))))
    time("raw-only")(o.select(col("o_orderkey"), raw.as("raw")).count())
    time("one-try_to_date")(o.select(try_to_date(raw, "yyyy-M")).count())
    time("parse-full")(o.select(DateNorm.normalizeDate(raw)).count())
    time("parse-full-again")(o.select(DateNorm.normalizeDate(raw)).count())
    spark.stop()
  }
}
