package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.annotate.RuleAnnotator
import graft.pairs.PairsBuilder
import graft.profile.Profiler
import graft.sources.Lake

class PairsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val gt = Seq(
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("ghost", "g_col", "nation", "n_nationkey")) // missing stats side
    .toDF("query_table", "query_column", "candidate_table", "candidate_column")

  private lazy val profiles =
    Profiler.profileLake(spark, sf0001, Seq("region", "nation", "customer"))

  test("gtColumns dedups both sides (P6)") {
    val cols = PairsBuilder.gtColumns(gt).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(cols == Set("nation" -> "n_regionkey", "region" -> "r_regionkey",
      "customer" -> "c_nationkey", "nation" -> "n_nationkey", "ghost" -> "g_col"))
  }

  test("withStats drops GT columns without profiles (J1 inner semantics)") {
    val stats = PairsBuilder.withStats(PairsBuilder.gtColumns(gt), profiles)
    val tables = stats.select("table").as[String].collect().toSet
    assert(!tables.contains("ghost"))
    assert(stats.count() == 4)
  }

  test("buildPairs falls back to the bare column name when metadata missing (J6)") {
    val texts = PairsBuilder.columnTexts(
      PairsBuilder.withStats(PairsBuilder.gtColumns(gt), profiles),
      None, useAnnotation = false)
    val pairs = PairsBuilder.buildPairs(gt, texts).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.length == 3)
    val ghostPair = pairs.find(_._1 == "g_col")
    assert(ghostPair.isDefined) // fallback: bare name
    assert(ghostPair.get._2.contains("n_nationkey contains"))
  }

  test("annotation-aware text uses semantic name as header") {
    val texts = PairsBuilder.columnTexts(
      PairsBuilder.withStats(PairsBuilder.gtColumns(gt), profiles),
      Some(RuleAnnotator.annotate(profiles)), useAnnotation = true)
    val t = texts.filter(col("column") === "n_regionkey")
      .select("text").as[String].head()
    // reference format B6 with title + semantic header
    assert(t.startsWith("nation regionkey contains 25 values (min=1, max=1, avg=1.0): "))
  }

  test("positional 80/20 split: sizes and disjointness (T5)") {
    val pairs = (1 to 10).map(i => (s"a$i", s"b$i")).toDF("text_a", "text_b")
    val (train, test) = PairsBuilder.splitPairs(pairs, 0.8, seed = 42)
    assert(train.count() == 8 && test.count() == 2)
    assert(train.intersect(test).count() == 0)
  }

  test("buildTrainingSet end-to-end: texts, split, JSONL files round-trip") {
    val out = Files.createTempDirectory("trainset").toString
    val gt = Seq(
      ("nation", "n_regionkey", "region", "r_regionkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"))
      .toDF("query_table", "query_column", "candidate_table", "candidate_column")
    val (train, test) = PairsBuilder.buildTrainingSet(spark, sf0001, gt, out)
    assert(train.count() == 4 && test.count() == 1) // ceil(5 * 0.8) = 4
    val backTrain = PairsBuilder.readPairsJsonl(spark, s"$out/train")
    val backTest = PairsBuilder.readPairsJsonl(spark, s"$out/test")
    assert(backTrain.count() == 4 && backTest.count() == 1)
    // every pair text is the annotated column sentence, not a bare name
    val all = backTrain.union(backTest).collect()
      .flatMap(r => Seq(r.getString(0), r.getString(1)))
    assert(all.forall(_.contains(" contains ")))
    // no overlap between the splits
    assert(backTrain.intersect(backTest).count() == 0)
  }

  test("JSONL pairs sink/source round-trip (S8/S6)") {
    val dir = Files.createTempDirectory("pairs_jsonl").toString
    val pairs = Seq(("alpha text", "beta text"), ("g1", "g2"))
      .toDF("text_a", "text_b")
    PairsBuilder.writePairsJsonl(pairs, dir)
    val back = PairsBuilder.readPairsJsonl(spark, dir)
    assert(back.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set("alpha text" -> "beta text", "g1" -> "g2"))
    // file format: one JSON array per line
    val firstLine = spark.read.text(dir).as[String].collect().head
    assert(firstLine.startsWith("[\"") && firstLine.endsWith("\"]"))
  }
}
