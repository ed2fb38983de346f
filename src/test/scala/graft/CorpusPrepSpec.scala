package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sources.Lake
import graft.text.{Analysis, CorpusPrep, CorpusPrepConfig, Packing}

/** The composed corpus-prep pipeline: stage-for-stage equality with the
  * hand-wired operator sequence, and the no-re-scan plan shape (the
  * corpus parquet is read once, inside the clean stage's checkpoint).
  */
class CorpusPrepSpec extends SparkSpec {

  private val cfg = CorpusPrepConfig(
    minTokens = 3, maxPunctRatio = 0.5, lang = "en",
    lexicalStrategy = "ngram", lexicalThreshold = 0.9,
    contaminationMaxFrac = 0.5, testFrac = 0.25, packBudget = 512,
    // the hand-composed comparisons pack at the raw split grain; the
    // sharded scale default gets its own dedicated test
    packShards = 1)

  private lazy val docs = Lake.table(spark, sf0001, "documents")
    .select(col("doc_id").cast("long").as("doc_id"), col("text"))

  test("prepare ≡ the hand-composed stage sequence") {
    val emb = Lake.embeddings(spark, sf0001)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val bench = docs.filter(col("doc_id") >= 100 && col("doc_id") < 110)
      .select(col("doc_id").as("bench_id"),
        concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 3, 12))
          .as("bench_text"))

    val got = CorpusPrep.prepare(docs, "doc_id", "text",
      embeddings = Some(emb), embIdCol = "vec_id", embVecCol = "embedding",
      benchmark = Some(bench), benchIdCol = "bench_id",
      benchTextCol = "bench_text", config = cfg)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4))).toSet

    // the same seven stages, hand-wired through the public operators
    val cleaned = Analysis.cleanCorpus(docs, "doc_id", "text", 3, 0.5, "en")
    val lex = Dedup.ngramJaccardPairs(cleaned, "id", "clean_text", 3, 0.9)
      .select("id_a", "id_b")
    val live = emb.select(col("vec_id").cast("long").as("sid"),
        col("embedding").as("svec"))
      .join(cleaned.select(col("id").as("sid")), "sid")
    val sem = Dedup.semanticNearDups(live, "sid", "svec", 1e-6,
      nClusters = 16, assignProbes = 2).select("id_a", "id_b")
    val pairs = lex.unionByName(sem)
    val comp = Dedup.nearDupComponents(pairs)
    val deduped = cleaned.join(
      comp.filter(col("id") =!= col("component")).select("id"),
      Seq("id"), "left_anti")
    val hits = Analysis.contaminationCheck(deduped, "id", "clean_text",
        bench, "bench_id", "bench_text", 8)
      .filter(col("bench_overlap_frac") >= 0.5)
      .select(col("doc_id").as("id")).distinct()
    val fin = deduped.join(hits, Seq("id"), "left_anti")
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"),
        col("clean_text"))
      .withColumn("is_test", Dedup.splitIsTest(col("component"), 0.25))
      .withColumn("size", graft.functions.TextFns.tokenCount(col("clean_text")))
      .withColumn("split", when(col("is_test"), lit("test")).otherwise(lit("train")))
    val packed = Packing.packGreedy(fin, "id", "size", "split", 512)
    val want = fin.join(packed.select(col("id"), col("seq_id")), "id")
      .select("id", "component", "is_test", "size", "seq_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4))).toSet

    assert(got == want)
    assert(got.nonEmpty)
  }

  test("minhash strategy (the scale default) composes identically") {
    val viaMinhash = CorpusPrep.prepare(docs, "doc_id", "text",
      config = cfg.copy(lexicalStrategy = "minhash"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4))).toSet
    // hand-composed with the same pair producer
    val cleaned = Analysis.cleanCorpus(docs, "doc_id", "text", 3, 0.5, "en")
    val pairs = Dedup.minHashLshCandidates(cleaned, "id", "clean_text")
      .filter(col("est_jaccard") >= 0.9).select("id_a", "id_b")
    val comp = Dedup.nearDupComponents(pairs)
    val fin = cleaned.join(
        comp.filter(col("id") =!= col("component")).select("id"),
        Seq("id"), "left_anti")
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"),
        col("clean_text"))
      .withColumn("is_test", Dedup.splitIsTest(col("component"), 0.25))
      .withColumn("size", graft.functions.TextFns.tokenCount(col("clean_text")))
      .withColumn("split", when(col("is_test"), lit("test")).otherwise(lit("train")))
    val packed = Packing.packGreedy(fin, "id", "size", "split", 512)
    val want = fin.join(packed.select(col("id"), col("seq_id")), "id")
      .select("id", "component", "is_test", "size", "seq_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(viaMinhash == want)
    assert(viaMinhash.nonEmpty)
    intercept[IllegalArgumentException](
      CorpusPrep.prepare(docs, "doc_id", "text",
        config = cfg.copy(lexicalStrategy = "nope")))
  }

  test("substring-dedup stage composes after clean, before the pair stages") {
    val got = CorpusPrep.prepare(docs, "doc_id", "text",
      config = cfg.copy(substringDedupL = 8))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4))).toSet
    val cleaned = Analysis.dedupSubstrings(
      Analysis.cleanCorpus(docs, "doc_id", "text", 3, 0.5, "en"),
      "id", "clean_text", 8).select(col("id"), col("clean_text"))
    val pairs = Dedup.ngramJaccardPairs(cleaned, "id", "clean_text", 3, 0.9)
      .select("id_a", "id_b")
    val comp = Dedup.nearDupComponents(pairs)
    val fin = cleaned.join(
        comp.filter(col("id") =!= col("component")).select("id"),
        Seq("id"), "left_anti")
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"),
        col("clean_text"))
      .withColumn("is_test", Dedup.splitIsTest(col("component"), 0.25))
      .withColumn("size", graft.functions.TextFns.tokenCount(col("clean_text")))
      .withColumn("split", when(col("is_test"), lit("test")).otherwise(lit("train")))
    val packed = Packing.packGreedy(fin, "id", "size", "split", 512)
    val want = fin.join(packed.select(col("id"), col("seq_id")), "id")
      .select("id", "component", "is_test", "size", "seq_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("DSIR selection gate composes after clean, before the pair stages") {
    // target = a doc subset; smoothing over the fixed bucket space skews
    // absolute weights negative when the target is a near-uniform
    // subsample, so the gate threshold comes from the DATA — the median
    // weight over the cleaned survivors keeps roughly half
    val target = docs.filter(col("doc_id") < 50).select(col("text"))
    val cleanedForThreshold =
      Analysis.cleanCorpus(docs, "doc_id", "text", 3, 0.5, "en")
    val allW = graft.text.Dsir.importanceWeights(cleanedForThreshold,
        "id", "clean_text", target, "text")
      .collect().map(_.getDouble(2)).sorted
    val minW = allW(allW.length / 2)
    val got = CorpusPrep.prepare(docs, "doc_id", "text",
      dsirTarget = Some(target), dsirTargetTextCol = "text",
      config = cfg.copy(dsirMinWeight = Some(minW)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4))).toSet
    val cleanedAll = Analysis.cleanCorpus(docs, "doc_id", "text", 3, 0.5, "en")
    val cleaned = cleanedAll.join(
      graft.text.Dsir.importanceWeights(cleanedAll, "id", "clean_text",
          target, "text")
        .filter(col("weight") >= minW).select("id"), "id")
    val pairs = Dedup.ngramJaccardPairs(cleaned, "id", "clean_text", 3, 0.9)
      .select("id_a", "id_b")
    val comp = Dedup.nearDupComponents(pairs)
    val fin = cleaned.join(
        comp.filter(col("id") =!= col("component")).select("id"),
        Seq("id"), "left_anti")
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"),
        col("clean_text"))
      .withColumn("is_test", Dedup.splitIsTest(col("component"), 0.25))
      .withColumn("size", graft.functions.TextFns.tokenCount(col("clean_text")))
      .withColumn("split", when(col("is_test"), lit("test")).otherwise(lit("train")))
    val packed = Packing.packGreedy(fin, "id", "size", "split", 512)
    val want = fin.join(packed.select(col("id"), col("seq_id")), "id")
      .select("id", "component", "is_test", "size", "seq_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    // the gate actually selects (some but not all survivors pass)
    val ungated = CorpusPrep.prepare(docs, "doc_id", "text", config = cfg)
      .count()
    assert(got.nonEmpty && got.size < ungated)
    // a threshold without a target is a configuration error
    intercept[IllegalArgumentException] {
      CorpusPrep.prepare(docs, "doc_id", "text",
        config = cfg.copy(dsirMinWeight = Some(0.0)))
    }
  }

  test("sharded packing (the scale default): same survivors, unique " +
    "per-split seq ids, budget honored per sequence") {
    import spark.implicits._
    val dense = CorpusPrep.prepare(docs, "doc_id", "text",
      config = cfg.copy(packShards = 1))
      .select("id", "component", "is_test", "size", "seq_id")
    val sharded = CorpusPrep.prepare(docs, "doc_id", "text",
      config = cfg.copy(packShards = 8))
      .select("id", "component", "is_test", "size", "seq_id")
    // packing grain changes WHICH sequence a doc lands in, never which
    // docs survive or their dedup/split labels
    val d = dense.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getBoolean(2), r.getLong(3))).toSet
    val s = sharded.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getBoolean(2), r.getLong(3))).toSet
    assert(s == d, "sharded packing changed the surviving rows")
    // every sequence respects the budget (no doc here exceeds it) and
    // seq ids do not collide across shards within a split
    val seqTotals = sharded.groupBy("is_test", "seq_id")
      .agg(sum("size").as("total")).collect()
    assert(seqTotals.forall(_.getLong(2) <= cfg.packBudget),
      "a sharded sequence exceeds the budget")
    // determinism: same config, same assignment
    val again = CorpusPrep.prepare(docs, "doc_id", "text",
        config = cfg.copy(packShards = 8))
      .select("id", "seq_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == sharded.select("id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("empty corpus flows through all stages to an empty result") {
    val empty = docs.filter(col("doc_id") < 0)
    val res = CorpusPrep.prepare(empty, "doc_id", "text", config = cfg)
    assert(res.isEmpty)
    assert(res.columns.toSeq ==
      Seq("id", "component", "is_test", "size", "seq_id"))
  }

  test("no re-scans: the final plan reads checkpoints, not the corpus") {
    val res = CorpusPrep.prepare(docs, "doc_id", "text", config = cfg)
    // every doc-derived stage flows through the lazy localCheckpoints, so
    // the returned plan contains NO parquet file scan — the corpus was
    // scanned exactly once, inside the clean stage's materialization
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan") && !plan.contains("Scan parquet"),
      s"corpus re-scan in the final plan:\n$plan")
    // and the pipeline still yields sane rows without emb/bench stages
    val rows = res.collect()
    assert(rows.length > 100)
    // packing respects the budget for multi-doc sequences
    val over = Packing.packedSequences(
      res.select(when(col("is_test"), lit("test")).otherwise(lit("train"))
          .as("group"), col("id"), col("size"),
        col("seq_id")).withColumnRenamed("seq_id", "seq_id"))
      .filter(col("n_docs") > 1 && col("total_size") > 512)
    assert(over.isEmpty, "a multi-doc packed sequence exceeds the budget")
  }
}
