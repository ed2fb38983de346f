package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Configuration for [[CorpusPrep.prepare]]. Defaults are the operators'
  * own defaults; `lexicalStrategy` picks the near-dup pair producer —
  * `"minhash"` (LSH banding, the 100 TB scale path), `"ngram"` (exact
  * AllPairs prefix-filter jaccard over `lexicalNgram`-word shingles —
  * deterministic, SQL-replayable, and phrase-selective: on templated
  * corpora the word-SET grain is pathologically dense while the shingle
  * grain stays sparse), or `"jaccard"` (word-set AllPairs; use only when
  * the vocabulary grain is known to be selective).
  */
final case class CorpusPrepConfig(
    minTokens: Long = 5,
    maxPunctRatio: Double = 0.3,
    lang: String = "en",
    substringDedupL: Int = 0,
    dsirMinWeight: Option[Double] = None,
    lexicalStrategy: String = "minhash",
    lexicalThreshold: Double = 0.9,
    lexicalNgram: Int = 3,
    semanticMaxCosDist: Double = 1e-6,
    semanticClusters: Int = 16,
    semanticProbes: Int = 2,
    semanticDistributedTrain: Boolean = false,
    semanticTwoLevelAssign: Boolean = false,
    semanticBlockCap: Int = 0,
    semanticSubClusters: Int = 16,
    contaminationShingle: Int = 8,
    contaminationMaxFrac: Double = 0.5,
    testFrac: Double = 0.2,
    packBudget: Long = 512,
    packShards: Int = 64)

/** The composed corpus-preparation pipeline — what a user actually runs
  * ahead of a training job, as ONE library entry instead of seven
  * hand-wired calls:
  *
  *  1. clean: PII scrub → quality floor → language filter → exact dedup
  *     ([[Analysis.cleanCorpus]] — one scan, one shuffle), optionally
  *     followed by repeated-span removal (`substringDedupL`) and a DSIR
  *     importance-weight selection gate against a target corpus
  *     (`dsirMinWeight` + `dsirTarget` — [[Dsir.importanceWeights]]);
  *  2. lexical near-dup pairs over the cleaned survivors
  *     ([[graft.dedup.Dedup.minHashLshCandidates]] or
  *     [[graft.dedup.Dedup.wordJaccardPairs]]);
  *  3. semantic near-dup pairs over the survivors' embeddings
  *     ([[graft.dedup.Dedup.semanticNearDups]], optional);
  *  4. connected components over the union pair graph → drop every
  *     non-minimum member ([[graft.dedup.Dedup.nearDupComponents]]);
  *  5. decontaminate against a benchmark set
  *     ([[Analysis.contaminationCheck]], optional): drop survivors whose
  *     benchmark shingle overlap reaches `contaminationMaxFrac`;
  *  6. leakage-safe split keyed on the SAME component labels — a near-dup
  *     group never straddles the train/test boundary
  *     ([[graft.dedup.Dedup.splitIsTest]]);
  *  7. greedy sequence packing per split side ([[Packing.packGreedy]],
  *     size = token count, group = train/test).
  *
  * Each intermediate the plan references more than once (`cleaned`,
  * `pairs`, `deduped`, the final labeled frame) is a LAZY
  * `localCheckpoint` — the corpus is scanned once by the clean stage and
  * every later stage reads the materialized survivors, never the source
  * again (asserted by CorpusPrepSpec's plan-shape test). Component
  * labels are computed ONCE and shared by the drop stage and the split
  * stage. All stage shapes keep their own scale contracts (blocked
  * pairs, narrow shuffles, no N²).
  *
  * Output: (id, component, is_test, size, seq_id) — one row per
  * surviving document: its near-dup component label, split side, token
  * count, and packed-sequence id (0-based per split side).
  */
object CorpusPrep {

  def prepare(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      embeddings: Option[DataFrame] = None,
      embIdCol: String = "id",
      embVecCol: String = "vec",
      benchmark: Option[DataFrame] = None,
      benchIdCol: String = "id",
      benchTextCol: String = "text",
      dsirTarget: Option[DataFrame] = None,
      dsirTargetTextCol: String = "text",
      config: CorpusPrepConfig = CorpusPrepConfig()): DataFrame = {
    val cfg = config

    val cleanedRaw = Analysis.cleanCorpus(docs, idCol, textCol, cfg.minTokens,
      cfg.maxPunctRatio, cfg.lang)
    // optional repeated-span removal (ExactSubstr) AFTER exact-doc dedup
    // (so intentional full copies were already collapsed to one canonical
    // and cross-copy spans don't erase it) and BEFORE the near-dup pair
    // stages (which should judge the deduplicated text)
    // lazy checkpoint HERE, before the optional DSIR gate: with the gate
    // on, this frame feeds the weight model's gram scan, its zero-feature
    // restore, AND the gate join — without the checkpoint the regex-heavy
    // clean (+ substring-dedup) pipeline would re-execute per consumer
    val substrDeduped = (if (cfg.substringDedupL > 0)
        Analysis.dedupSubstrings(cleanedRaw, "id", "clean_text",
          cfg.substringDedupL)
          .select(col("id"), col("clean_text"))
      else cleanedRaw)
      .localCheckpoint(eager = false)
    // optional DSIR selection gate ([[Dsir.importanceWeights]] against
    // `dsirTarget`): keep documents at least `dsirMinWeight` log-likelier
    // under the target's hashed-n-gram model than under the corpus's own.
    // Runs on the CLEANED text (quality junk must not pollute the raw
    // distribution) and before the pair stages (no point pairing docs the
    // selection is about to drop). A fixed threshold, not a top-k - the
    // gate stays a declarative filter with no global quantile.
    val selected = (cfg.dsirMinWeight, dsirTarget) match {
      case (Some(minW), Some(target)) =>
        substrDeduped.join(
          Dsir.importanceWeights(substrDeduped, "id", "clean_text",
              target, dsirTargetTextCol)
            .filter(col("weight") >= minW).select("id"),
          "id")
      case (Some(_), None) => throw new IllegalArgumentException(
        "CorpusPrep: dsirMinWeight set but no dsirTarget given")
      // the mirror misconfiguration must fail the same way — a target
      // corpus passed without a threshold would otherwise be read and
      // silently dropped on the floor, the gate the caller clearly
      // intended never running
      case (None, Some(_)) => throw new IllegalArgumentException(
        "CorpusPrep: dsirTarget given but no dsirMinWeight set")
      case _ => substrDeduped
    }
    // gate off → `selected` IS the already-checkpointed frame; avoid
    // materializing a second identical copy
    val cleaned =
      if (selected eq substrDeduped) substrDeduped
      else selected.localCheckpoint(eager = false)

    val lexPairs = (cfg.lexicalStrategy match {
      case "minhash" =>
        graft.dedup.Dedup.minHashLshCandidates(cleaned, "id", "clean_text")
          .filter(col("est_jaccard") >= cfg.lexicalThreshold)
      case "ngram" =>
        graft.dedup.Dedup.ngramJaccardPairs(cleaned, "id", "clean_text",
          cfg.lexicalNgram, cfg.lexicalThreshold)
      case "jaccard" =>
        graft.dedup.Dedup.wordJaccardPairs(cleaned, "id", "clean_text",
          cfg.lexicalThreshold)
      case other => throw new IllegalArgumentException(
        s"CorpusPrep: unknown lexicalStrategy '$other' (minhash | ngram | jaccard)")
    }).select("id_a", "id_b")

    val semPairs = embeddings.map { emb =>
      // pairs among CLEAN SURVIVORS only: an embedding of a document the
      // quality gate already dropped must not link two survivors into one
      // component
      // lazy checkpoint (the pipeline-wide rule): this join is otherwise
      // executed three times — the emptiness gate here, then
      // semanticNearDups' k-means sample collect and its assignment
      // materialization both re-run it as their scan lineage
      val live = emb
        .select(col(embIdCol).cast("long").as("sid"), col(embVecCol).as("svec"))
        .join(cleaned.select(col("id").as("sid")), "sid")
        .localCheckpoint(eager = false)
      if (live.isEmpty) None
      else Some(graft.dedup.Dedup.semanticNearDups(live, "sid", "svec",
          cfg.semanticMaxCosDist, nClusters = cfg.semanticClusters,
          assignProbes = cfg.semanticProbes,
          distributedTrain = cfg.semanticDistributedTrain,
          twoLevelAssign = cfg.semanticTwoLevelAssign,
          blockCap = cfg.semanticBlockCap,
          subClusters = cfg.semanticSubClusters)
        .select("id_a", "id_b"))
    }.flatten

    val pairs = semPairs.fold(lexPairs)(lexPairs.unionByName(_))
      .localCheckpoint(eager = false)
    val comp = graft.dedup.Dedup.nearDupComponents(pairs)

    val deduped = cleaned
      .join(comp.filter(col("id") =!= col("component")).select("id"),
        Seq("id"), "left_anti")
      .localCheckpoint(eager = false)

    val decontaminated = benchmark.fold(deduped) { b =>
      val hits = Analysis.contaminationCheck(deduped, "id", "clean_text",
          b, benchIdCol, benchTextCol, cfg.contaminationShingle)
        .filter(col("bench_overlap_frac") >= cfg.contaminationMaxFrac)
        .select(col("doc_id").as("id")).distinct()
      deduped.join(hits, Seq("id"), "left_anti")
    }

    val labeled = decontaminated
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("component"),
        col("clean_text"))
      .withColumn("is_test",
        graft.dedup.Dedup.splitIsTest(col("component"), cfg.testFrac))
      .withColumn("size",
        graft.functions.TextFns.tokenCount(col("clean_text")))
      .withColumn("split",
        when(col("is_test"), lit("test")).otherwise(lit("train")))
      .localCheckpoint(eager = false)

    // packGreedy is sequential PER GROUP — packing the raw train/test
    // split would funnel the whole train corpus through ONE task.
    // `packShards` sub-shards each split by id hash (the group grain
    // packGreedy's contract asks the caller to choose); seq_id is then
    // made unique within its split by interleaving the shard index
    // (seq·shards + shard) — unique and deterministic, not dense.
    // packShards <= 1 keeps the legacy dense-per-split ids (the oracle
    // configuration).
    val packed =
      if (cfg.packShards <= 1)
        Packing.packGreedy(labeled, "id", "size", "split", cfg.packBudget)
      else {
        val sharded = labeled.withColumn("__pack_grp",
          concat_ws("#", col("split"),
            pmod(xxhash64(col("id")), lit(cfg.packShards.toLong))))
        Packing.packGreedy(sharded, "id", "size", "__pack_grp",
            cfg.packBudget)
          .withColumn("seq_id",
            col("seq_id") * cfg.packShards +
              element_at(split(col("group"), "#"), 2).cast("long"))
      }
    labeled
      .join(packed.select(col("id"), col("seq_id")), "id")
      .select("id", "component", "is_test", "size", "seq_id")
  }
}
