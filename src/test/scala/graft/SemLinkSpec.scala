package graft

import org.apache.spark.sql.functions._

import graft.pipeline.SemLink

/** End-to-end golden check (SURVEY.md §5.4): the full discovery pipeline
  * with the deterministic embedder must surface the lake's real key
  * relationships (FIXTURES.md §A known joins).
  */
class SemLinkSpec extends SparkSpec {

  test("flagship pipeline discovers the known key relationships at sf0.001") {
    val pairs = SemLink.discover(spark, sf0001, k = 5, threshold = 1.3)
      .select("t1", "c1", "t2", "c2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(pairs.nonEmpty)
    // ground-truth relationships that the deterministic embedder must find
    assert(pairs.contains(("nation", "n_regionkey", "region", "r_regionkey")))
    assert(pairs.contains(("lineitem", "l_shipdate", "orders", "o_orderdate")))
    // symmetric output (both directions present)
    assert(pairs.contains(("region", "r_regionkey", "nation", "n_regionkey")))
  }

  test("semantic-mode prompts carry annotation, samples, and most-common values") {
    import graft.annotate.RuleAnnotator
    import graft.pipeline.SemLink
    import graft.profile.Profiler
    val profiles = Profiler.profileLake(spark, sf0001, Seq("nation"))
    val prompts = SemLink.columnPrompts(profiles, RuleAnnotator.annotate(profiles))
    val t = prompts.filter(org.apache.spark.sql.functions.col("key") === "nation:n_regionkey")
      .select("text").collect().head.getString(0)
    assert(t.contains("has semantic annotation: 'regionkey'"))
    assert(t.contains("Examples of values for this attribute include:"))
    assert(t.contains("The dataset for column 'n_regionkey' contains 25 entries."))
    assert(t.contains("Top 20 most frequent values in the column:"))
  }

  test("semantic-mode discovery runs end-to-end and finds a key relationship") {
    val pairs = SemLink.discoverSemantic(spark, sf0001, k = 5, threshold = 1.35)
      .select("t1", "c1", "t2", "c2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(pairs.nonEmpty)
    // prompts put the shared 'regionkey'/'nationkey' annotations front and
    // center, so the key relationships must surface in semantic mode too
    assert(pairs.contains(("nation", "n_regionkey", "region", "r_regionkey")))
    assert(pairs.contains(("customer", "c_nationkey", "nation", "n_nationkey")))
  }

  test("threshold is honored: tighter threshold yields a subset") {
    val loose = SemLink.discover(spark, sf0001, k = 5, threshold = 1.3)
      .select("t1", "c1", "t2", "c2").collect().toSet
    val tight = SemLink.discover(spark, sf0001, k = 5, threshold = 0.5)
      .select("t1", "c1", "t2", "c2").collect().toSet
    assert(tight.subsetOf(loose))
    assert(tight.size < loose.size)
  }
}
