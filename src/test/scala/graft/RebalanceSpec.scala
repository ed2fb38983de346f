package graft

import org.apache.spark.sql.functions._

import graft.profile.Sampling

class RebalanceSpec extends SparkSpec {
  import spark.implicits._

  // en:100 rows, de:50, fr:25 — target 50/50 en/de makes de the binding
  // stratum (M = min(100/0.5, 50/0.5) = 100): de keeps everything
  // (rate exactly 1.0), en halves (rate exactly 0.5), fr is dropped.
  private def corpus = (
    (1L to 100L).map(i => (i, "en")) ++
    (101L to 150L).map(i => (i, "de")) ++
    (151L to 175L).map(i => (i, "fr"))).toDF("id", "lang")

  test("rebalance keeps the binding stratum whole and drops unlisted strata") {
    val out = Sampling.rebalanceToMixture(corpus, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.5))
    val byLang = out.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr"))
    assert(byLang("de") == 50L)
    // en's exact membership is the established hash-coin rule at 0.5
    val expectedEn = Sampling.stratifiedHashSample(
        corpus.filter($"lang" === "en"), "id", "lang", Map("en" -> 0.5))
      .collect().map(_.getLong(0)).toSet
    val gotEn = out.filter($"lang" === "en").collect()
      .map(_.getLong(0)).toSet
    assert(gotEn == expectedEn)
    assert(out.columns.toSeq == Seq("id", "lang"))
  }

  test("mass-weighted rebalance derives rates from the mass column") {
    // en mass 400 (4×100), de mass 100 — target 50/50 by mass:
    // M = min(400/0.5, 100/0.5) = 200; rate_en = 0.25, rate_de = 1.0
    val df = ((1L to 4L).map(i => (i, "en", 100L)) ++
      Seq((5L, "de", 100L))).toDF("id", "lang", "toks")
    val out = Sampling.rebalanceToMixture(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.5), massCol = Some("toks"))
    assert(out.filter($"lang" === "de").count() == 1L)
    val expectedEn = Sampling.stratifiedHashSample(
        df.filter($"lang" === "en"), "id", "lang", Map("en" -> 0.25))
      .collect().map(_.getLong(0)).toSet
    assert(out.filter($"lang" === "en").collect().map(_.getLong(0)).toSet
      == expectedEn)
  }

  test("a target stratum absent from the corpus contributes nothing") {
    val out = Sampling.rebalanceToMixture(corpus, "id", "lang",
      Map("en" -> 0.5, "xx" -> 0.5))
    // en is the only present target stratum → binding → kept whole
    assert(out.count() == 100L)
    assert(out.select("lang").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("en"))
  }

  test("null strata are excluded; invalid shares are rejected") {
    val df = Seq((1L, "en"), (2L, null)).toDF("id", "lang")
    assert(Sampling.rebalanceToMixture(df, "id", "lang", Map("en" -> 1.0))
      .count() == 1L)
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToMixture(df, "id", "lang", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.rebalanceToMixture(df, "id", "lang", Map("en" -> 0.0))
    }
  }

  test("membership is stable under repartitioning") {
    val a = Sampling.rebalanceToMixture(corpus, "id", "lang",
      Map("en" -> 0.3, "de" -> 0.4, "fr" -> 0.3))
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.rebalanceToMixture(corpus.repartition(17), "id", "lang",
      Map("en" -> 0.3, "de" -> 0.4, "fr" -> 0.3))
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }
}
