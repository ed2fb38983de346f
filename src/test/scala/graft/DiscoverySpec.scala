package graft

import org.apache.spark.sql.functions._

import graft.discover.Discovery

/** The squared-vs-rooted L2 trap (SURVEY.md §7.4): distances are STORED
  * squared (FAISS convention); the square root is applied only inside the
  * threshold predicate.
  */
class DiscoverySpec extends SparkSpec {
  import spark.implicits._

  test("thresholdFilter roots the stored squared distance at filter time") {
    val d = Seq(
      ("a", "b", 0.09), // sqrt = 0.3  → kept at t=0.3
      ("a", "c", 0.10), // sqrt ≈ 0.316 → dropped at t=0.3
      ("a", "d", 0.0))  // self-distance edge
      .toDF("column_1", "column_2", "distance_anns")
    val kept = Discovery.thresholdFilter(d, "distance_anns", 0.3)
      .select("column_2").as[String].collect().toSet
    assert(kept == Set("b", "d"))
    // the naive mistake (comparing the squared value directly) would keep c
    assert(d.filter(col("distance_anns") <= 0.3).count() == 3)
  }

  test("toJoinablePairs splits the two-field table:column key") {
    val pairs = Discovery.toJoinablePairs(
      Seq(("orders:o_custkey", "customer:c_custkey", 0.5))
        .toDF("column_1", "column_2", "distance_anns"),
      "column_1", "column_2", "distance_anns").collect().head
    assert(pairs.getString(0) == "orders" && pairs.getString(1) == "o_custkey")
    assert(pairs.getString(2) == "customer" && pairs.getString(3) == "c_custkey")
  }

  test("symmetrized ground truth holds both directions, deduped") {
    val gt = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("q", "c")
    val sym = Discovery.symmetrizeGroundTruth(gt, "q", "c").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sym == Set("a" -> "b", "b" -> "a"))
  }
}
