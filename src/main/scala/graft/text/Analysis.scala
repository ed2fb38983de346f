package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Text-analysis operators for training-data pipelines (added scope,
  * SURVEY.md §7.4): token counting, quality scoring, language-ID heuristic,
  * document fingerprinting. All pure built-in expressions → whole-stage
  * codegen, trivially data-parallel at 100 TB.
  */
object Analysis {

  /** Stopword dictionaries for the n-gram/function-word language heuristic.
    * Deliberately tiny — a heuristic signal, not a model.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"))

  private def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  /** Dictionary-hit count as a native codegen expression (one hash probe
    * per token) — the HOF-lambda form is interpreted per element and
    * blocks codegen subexpression elimination in argmax trees.
    */
  private def countIn(toks: Column, dict: Seq[String]): Column = {
    import org.apache.spark.sql.graft.{Interop, StopwordCount}
    Interop.column(StopwordCount(Interop.expression(toks), dict))
  }

  /** Per-document quality statistics: token count, char count, average word
    * length, punctuation ratio, digit ratio, English-stopword ratio, and a
    * 64-bit content fingerprint (xxhash64 of the normalized text — the
    * rolling-hash document fingerprint of the added scope).
    */
  def qualityStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL text reads as the empty document (the repetitionStats
    // convention): without the coalesce, n_tokens/n_chars/fingerprint
    // leak NULL and a downstream `n_tokens >= 5` filter silently drops
    // the doc via three-valued logic instead of scoring it empty
    val c = coalesce(col(textCol), lit(""))
    val toks = tokens(c)
    val nTok = TextFns.tokenCount(c)
    val nChar = length(c).cast("long")
    // mean token length = (chars of the COLLAPSED text − separators) /
    // tokens; raw length would credit leading/trailing/repeated
    // whitespace to the words ("  hi  " scoring 6.0 instead of 2.0)
    val nCollapsed = length(regexp_replace(trim(c), "\\s+", " ")).cast("long")
    val punct = (nChar - length(regexp_replace(c, "[\\p{Punct}]", ""))).cast("long")
    val digits = (nChar - length(regexp_replace(c, "[0-9]", ""))).cast("long")
    graft.util.Par.balance(df).select(
      col(idCol).cast("long").as("id"),
      nTok.as("n_tokens"),
      nChar.as("n_chars"),
      when(nTok > 0, round((nCollapsed - (nTok - 1)).cast("double") / nTok, 4))
        .otherwise(lit(0.0)).as("avg_word_len"),
      when(nChar > 0, round(punct.cast("double") / nChar, 4))
        .otherwise(lit(0.0)).as("punct_ratio"),
      when(nChar > 0, round(digits.cast("double") / nChar, 4))
        .otherwise(lit(0.0)).as("digit_ratio"),
      when(nTok > 0, round(countIn(toks, stopwords("en")).cast("double") / nTok, 4))
        .otherwise(lit(0.0)).as("stopword_ratio"),
      xxhash64(TextFns.normalizeText(c)).as("fingerprint"))
  }

  /** PII scrubbing for training corpora (added scope): masks emails, URLs,
    * IPv4 addresses and US-style phone numbers with typed placeholder
    * tokens. Pure `regexp_replace` chain — whole-stage codegen, and the
    * patterns are deliberately restricted to syntax shared by Java regex
    * and RE2 so a SQL oracle can replay them verbatim. URL runs first
    * (emails/IPs may be embedded in URLs), then email, IP, phone.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "https?://[^\\s]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b" -> "<PHONE>")

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * local fingerprinting algorithm): a TRUE rolling hash over char
    * `k`-grams of the normalized text, keeping the minimum of each
    * sliding window of `w` consecutive grams — distinct, sorted.
    * Guarantee: any two documents sharing a substring of at least
    * `w + k - 1` chars share at least one fingerprint, with ~2/(w+1) of
    * grams retained. Native codegen kernel expression
    * (sql/graft/SignatureExprs.scala), O(n) per document — the
    * Column-HOF formulation is O(n²) (UTF8String.substring seeks char
    * boundaries linearly; lambda bodies are excluded from codegen CSE).
    * Fingerprint sets are the natural blocking key for containment-style
    * near-dup at corpus scale; texts shorter than `k` fall back to the
    * whole-text hash.
    */
  def winnowingFingerprint(c: Column, k: Int = 8, w: Int = 4): Column =
    org.apache.spark.sql.graft.Interop.column(
      org.apache.spark.sql.graft.WinnowFingerprints(
        org.apache.spark.sql.graft.Interop.expression(TextFns.normalizeText(c)),
        new org.apache.spark.sql.graft.WinnowKernel(k, w)))

  def scrubPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Repetition quality stats — the Gopher-rule family (Rae et al. 2021,
    * "Scaling Language Models", Table A1): within-document repetition is
    * the strongest single signal of low-quality scraped text. Metrics:
    *
    *  - `dup_line_frac`: 1 − distinct lines / total lines;
    *  - `dup_line_char_frac`: characters inside lines occurring more
    *    than once / total line characters;
    *  - `top_2gram_char_frac`: characters covered by the most frequent
    *    word bigram (count × bigram length) / document characters —
    *    ties break by bigram string ascending.
    *
    * Shuffle posture: line grouping keys on (id, xxhash64(line)) with the
    * line LENGTH as payload — the exchange carries 8-byte hashes, never
    * line text (identical up to 64-bit collisions, negligible per doc);
    * bigram rows carry the two-word gram (needed for the deterministic
    * tie-break and length). Both aggregations are map-side partial; no
    * N², no window wider than one document's grams.
    *
    * Output: (id, n_lines, dup_line_frac, dup_line_char_frac,
    * top_2gram_char_frac), fractions rounded to 4 dp, 0.0 for documents
    * with no lines/words.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL text reads as the empty document (all metrics 0) — an inner
    // join against the exploded lines would otherwise silently DROP the
    // row from the output
    val base = graft.util.Par.balance(df)
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("__text"))

    // split limit −1 keeps trailing empty lines (matches SQL string_split)
    val lineCounts = base
      .select(col("id"), explode(split(col("__text"), "\n", -1)).as("line"))
      .select(col("id"), xxhash64(col("line")).as("lh"),
        length(col("line")).cast("long").as("len"))
      .groupBy("id", "lh")
      .agg(count(lit(1)).as("cnt"), min("len").as("len"))
    val lineAgg = lineCounts.groupBy("id").agg(
      sum("cnt").as("n_lines"),
      count(lit(1)).as("n_distinct"),
      sum(when(col("cnt") > 1, col("len") * col("cnt")).otherwise(0L))
        .as("dup_chars"),
      sum(col("len") * col("cnt")).as("tot_chars"))

    val ws = filter(split(trim(col("__text")), "\\s+"), w => w =!= "")
    val n = size(ws)
    val grams = zip_with(
      slice(ws, lit(1), greatest(n - 1, lit(0))),
      slice(ws, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val gramCounts = base
      .select(col("id"), explode(grams).as("gram"))
      .groupBy("id", "gram").agg(count(lit(1)).as("cnt"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("cnt"), asc("gram"))
    val topGram = gramCounts
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") === 1)
      .select(col("id"), (col("cnt") * length(col("gram"))).as("top_chars"))

    base.select(col("id"), length(col("__text")).cast("long").as("n_chars"))
      .join(lineAgg, Seq("id"))
      .join(topGram, Seq("id"), "left")
      .select(
        col("id"),
        col("n_lines"),
        when(col("n_lines") > 0,
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_lines"), 4))
          .otherwise(lit(0.0)).as("dup_line_frac"),
        when(col("tot_chars") > 0,
          round(col("dup_chars").cast("double") / col("tot_chars"), 4))
          .otherwise(lit(0.0)).as("dup_line_char_frac"),
        when(col("n_chars") > 0 && col("top_chars").isNotNull,
          round(col("top_chars").cast("double") / col("n_chars"), 4))
          .otherwise(lit(0.0)).as("top_2gram_char_frac"))
  }

  /** Unigram language-model quality score — the n=1 form of the KenLM
    * perplexity filter every web-scale pipeline runs: train token
    * probabilities on a reference corpus, score each document by mean
    * token log-probability (low = gibberish / OCR noise / wrong-language
    * text relative to the reference). Two passes, both shuffle-narrow:
    * the model is a (token, count) aggregation; scoring joins each
    * document's tokens against it and averages `ln P(token)` per doc.
    * Add-one smoothing over the training vocabulary covers tokens unseen
    * in `reference` (scoring a different corpus than the model's), so no
    * −∞ ever surfaces. Empty documents score 0.
    *
    * Output: (id, n_tokens, mean_logprob) — mean_logprob ≤ 0, higher is
    * more reference-like.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String): DataFrame = {
    // the empty string that `split` yields for blank text is not a token
    // on either side — blank documents take the explicit score-0 branch
    val refToks = reference.select(
        explode(tokens(coalesce(col(refTextCol), lit("")))).as("tok"))
      .filter(col("tok") =!= "")
    val counts = refToks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // add-one smoothing: denominator = total tokens + vocabulary size;
    // unseen tokens get count 0 + 1 through the left join's coalesce.
    // An empty/all-blank reference makes n NULL (sum over zero rows) —
    // fail loudly AT EXECUTION via raise_error rather than silently
    // NULL-scoring every document; an eager `require(!refToks.isEmpty)`
    // would run a Spark job over the reference at plan-construction
    // time, against the tfidfKeywords plan-construction-runs-no-job rule
    val totals = counts.agg(sum("cnt").as("n"), count(lit(1)).as("v"))
      .select(
        when(col("n").isNotNull, col("n")).otherwise(raise_error(
          lit("unigramLogProb: reference corpus has no tokens"))).as("n"),
        col("v"))
    val docToks = graft.util.Par.balance(docs)
      .select(col(idCol).cast("long").as("id"),
        explode(tokens(coalesce(col(textCol), lit("")))).as("tok"))
      .filter(col("tok") =!= "")
      .select("id", "tok")
    docToks
      .join(counts, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(col("id"),
        log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("n") + col("v"))).as("lp"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg("lp"), 4).as("mean_logprob"))
      .unionByName(
        // empty docs have no token rows — restore them at score 0
        docs.select(col(idCol).cast("long").as("id"))
          .join(docToks.select("id").distinct(), Seq("id"), "left_anti")
          .select(col("id"), lit(0L).as("n_tokens"),
            lit(0.0).as("mean_logprob")))
  }

  /** Per-document TF-IDF keywords: the `topK` terms ranked by
    * tf · ln(N / df) (raw counts, unsmoothed idf — df ≥ 1 for every term
    * actually present), ties broken by term ascending. Term statistics
    * are two narrow aggregations (per-doc counts; document frequency);
    * the ranking window partitions by document, so its state is one
    * document's vocabulary — never a corpus-wide sort.
    *
    * Output: (id, term, tf, score, rnk), rnk 1..topK per document.
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    val docToks = graft.util.Par.balance(df)
      .select(col(idCol).cast("long").as("id"),
        explode(tokens(coalesce(col(textCol), lit("")))).as("term"))
      .filter(col("term") =!= "")
    val tf = docToks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N as a 1-row broadcast aggregate, NOT a driver count(): constructing
    // the plan must not run a job, and N snapshots at the same action as
    // tf/df (the unigramLogProb `totals` pattern)
    val nDocs = df.select(col(idCol).cast("long").as("id")).distinct()
      .agg(count(lit(1)).cast("double").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("score"), asc("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n") / col("df")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select("id", "term", "tf", "score", "rnk")
  }

  /** Corpus-wide most frequent word n-grams — vocabulary/boilerplate
    * discovery (what are the dominant phrases; which n-grams deserve a
    * stoplist or a tokenizer merge). One grouped count over exploded
    * shingles, then a global top-k that plans as TakeOrdered — map-side
    * partial top-k per partition, never a full sort of the distinct-gram
    * space. Deterministic ties: count DESC, gram ASC.
    *
    * Output: (gram, cnt), exactly `k` rows (fewer if the corpus has
    * fewer distinct n-grams).
    */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    graft.util.Par.balance(df).select(explode(TextFns.wordShingles(
        coalesce(col(textCol), lit("")), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("gram"))
      .limit(k)

  /** Boilerplate line removal (the CCNet/C4 pattern): lines whose
    * DOCUMENT frequency reaches `minDocFreq` — site headers, footers,
    * navigation, cookie banners — are dropped from every document,
    * preserving the order of surviving lines. The frequency join keys on
    * the 8-byte line hash (distinct per doc before counting, so a line
    * repeated within one doc counts once); the reconstruction is a
    * per-document sorted fold — state bounded by one document's lines.
    * Documents whose every line was boilerplate survive as empty text.
    *
    * Output: (id, clean_text).
    */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDocFreq: Long): DataFrame = {
    // minDocFreq <= 1 would satisfy `df >= minDocFreq` for EVERY line
    // (each appears in at least its own doc) and silently empty the
    // whole corpus — the dedupSubstrings require-your-params rule
    require(minDocFreq >= 2,
      s"removeBoilerplateLines: minDocFreq must be >= 2, got $minDocFreq " +
        "(every line appears in at least its own document)")
    // lazy checkpoint: base feeds the line explode AND the final
    // restore join — one text scan, not two
    val base = graft.util.Par.balance(df)
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("__text"))
      .localCheckpoint(eager = false)
    val lines = base.select(col("id"),
      posexplode(split(col("__text"), "\n", -1)).as(Seq("pos", "line")))
    val docFreq = lines
      .select(col("id"), xxhash64(col("line")).as("lh")).distinct()
      .groupBy("lh").agg(count(lit(1)).as("df"))
    val kept = lines.withColumn("lh", xxhash64(col("line")))
      .join(docFreq, "lh")
      // blank lines are document STRUCTURE (paragraph separators), not
      // boilerplate — frequency-removing them would merge paragraphs
      // corpus-wide
      .filter(col("df") < minDocFreq || trim(col("line")) === "")
    val rebuilt = kept.groupBy("id")
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as("clean_text"))
    base.select(col("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Exact substring (repeated-span) deduplication — the ExactSubstr
    * method (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"), re-expressed at the word grain as relational
    * operators instead of a corpus-wide suffix array (a single-machine
    * construction with no distributed analog): any `l`-token span
    * occurring more than once across the corpus — any document, any
    * position, self-repeats included — marks all its token positions;
    * marked tokens are removed and each document is rebuilt from its
    * surviving tokens in order.
    *
    * Documented divergence: the suffix-array form keeps ONE occurrence of
    * each duplicated span; position-level canonical selection is a
    * sequential tie-break with no bounded-state distributed form, so this
    * removes EVERY occurrence (conservative over-removal — spans repeated
    * verbatim across a corpus are boilerplate-like by construction; run
    * [[graft.dedup.Dedup]] document-level dedup first so intentional
    * full copies don't erase the canonical).
    *
    * Shape: one posexplode at the l-gram grain, occurrence counts on
    * 8-byte hashes, a semi-join back, one l-row coverage explode per
    * SHARED gram only, and the [[removeBoilerplateLines]] per-doc ordered
    * rebuild. Exchanges carry (id, pos, hash) rows; text rides only the
    * final per-doc regroup.
    *
    * Output: (id, clean_text, n_removed) — n_removed = tokens dropped.
    */
  def dedupSubstrings(df: DataFrame, idCol: String, textCol: String,
      l: Int = 8): DataFrame = {
    require(l > 0, s"dedupSubstrings: l must be positive, got $l")
    // lazy checkpoint: base feeds the token explode, the gram explode
    // AND the final stats select — one scan of the (possibly expensive,
    // e.g. post-cleanCorpus) source instead of three
    val base = graft.util.Par.balance(df)
      .select(col(idCol).cast("long").as("id"),
        coalesce(col(textCol), lit("")).as("__text"))
      .localCheckpoint(eager = false)
    val toks = base.select(col("id"),
        posexplode(split(trim(col("__text")), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val grams = base.select(col("id"),
        posexplode(TextFns.wordShingles(col("__text"), l))
          .as(Seq("pos", "__g")))
      .select(col("id"), col("pos"), xxhash64(col("__g")).as("gh"))
    // spans with ≥ 2 occurrences ANYWHERE (count over occurrences, not
    // distinct docs — within-doc repetition is duplication too)
    val shared = grams.groupBy("gh").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select("gh")
    val covered = grams.join(shared, "gh")
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (l - 1))).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq("id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok"))).as("clean_text"),
        count(lit(1)).as("__kept"))
    base.select(col("id"), TextFns.tokenCount(col("__text")).as("__n_tok"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("__n_tok") - coalesce(col("__kept"), lit(0L))).as("n_removed"))
  }

  /** Long-document chunking — the front end of a chunk → embed → index
    * pipeline: one row per sliding word-window (see
    * [[graft.functions.TextFns.wordChunks]]), with the 0-based chunk
    * index. Pure scan-side explode: no shuffle, no state; chunk ids are
    * (doc, idx) so downstream embeddings/indexes key stably.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
        posexplode(TextFns.wordChunks(coalesce(col(textCol), lit("")),
          window, stride)).as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_text"))

  /** Benchmark-contamination detection — the decontamination pass every
    * serious training pipeline runs before evaluation (exact n-gram
    * collision against held-out benchmarks, the GPT-3/PaLM appendix
    * method): for every (corpus doc, benchmark item) pair sharing at
    * least one word n-gram, the overlap size and the fraction of the
    * benchmark item's distinct shingles found in the doc.
    *
    * Shape: distinct shingles per side, hashed to 8 bytes, one equi-join
    * on the hash — an inverted-index join, never corpus × benchmark. At
    * n = 8 (default) shingles are phrase-selective, so list skew is
    * bounded in practice; raise `n` to sharpen. Join carries only
    * (id, hash) rows; texts never shuffle.
    *
    * Output: (doc_id, bench_id, n_overlap, bench_overlap_frac) — one row
    * per colliding pair; `bench_overlap_frac` = n_overlap / the item's
    * distinct-shingle count (1.0 = the full benchmark item appears).
    * Benchmark items shorter than `n` words have no shingles and cannot
    * collide. Hash collisions (64-bit) can overcount by ~n²/2⁶⁵ — at
    * decontamination scale, negligible against the thresholding use.
    */
  def contaminationCheck(
      corpus: DataFrame, corpusIdCol: String, corpusTextCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 8): DataFrame = {
    def shingled(df: DataFrame, idCol: String, textCol: String,
        idAlias: String) =
      graft.util.Par.balance(df)
        .select(col(idCol).cast("long").as(idAlias),
          explode(array_distinct(TextFns.wordShingles(col(textCol), n)))
            .as("__sh"))
        .select(col(idAlias), xxhash64(col("__sh")).as("__shh"))
    val cSh = shingled(corpus, corpusIdCol, corpusTextCol, "doc_id")
    val bSh = shingled(benchmark, benchIdCol, benchTextCol, "bench_id")
    val bTotals = bSh.groupBy("bench_id")
      .agg(count(lit(1)).as("n_bench_shingles"))
    cSh.join(bSh, "__shh")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_overlap"))
      .join(bTotals, "bench_id")
      .select(col("doc_id"), col("bench_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / col("n_bench_shingles"), 4)
          .as("bench_overlap_frac"))
  }

  /** Composed corpus-cleaning pipeline — the canonical training-data prep
    * flow: PII scrub → quality floor (token count, punctuation ratio) →
    * language filter → exact dedup (canonical doc per identical cleaned
    * text). Returns (id, clean_text) for the surviving documents.
    *
    * ONE corpus scan + ONE shuffle. Identical scrubbed text yields
    * identical stats, so every duplicate of a kept document is also kept —
    * dedup-within-keepers equals dedup-then-intersect, and the whole
    * pipeline is a filtered projection followed by a min-id group keyed on
    * xxhash64(text) (8-byte shuffle key; one text copy rides as `min_by`
    * payload, collapsed map-side before the exchange).
    *
    * The scrub is evaluated exactly ONCE per row: its projection is wrapped
    * in [[org.apache.spark.sql.graft.OptimizerBarrier]], which stops both
    * optimizer moves that would re-inline the 4-regex chain into every
    * stat expression (~15 recomputations per row) — see the barrier's doc
    * for why an exchange or a `rand()` guard does not work.
    */
  def cleanCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Long = 5,
      maxPunctRatio: Double = 0.3,
      lang: String = "en"): DataFrame = {
    // lang_pred can only ever be a stopwords key or "und", so any other
    // value filters EVERY document — a silently empty corpus at the end
    // of a full pipeline run, indistinguishable from a genuinely
    // all-filtered one. Fail fast instead.
    require(stopwords.contains(lang) || lang == "und",
      s"cleanCorpus: unknown lang '$lang' " +
        s"(known: ${stopwords.keys.toSeq.sorted.mkString(", ")}, und)")
    val scrubOnce = {
      import org.apache.spark.sql.graft.{Interop, OptimizerBarrier}
      Interop.column(OptimizerBarrier(Interop.expression(scrubPii(col(textCol)))))
    }
    // Par.balance: the regex scrub + token stats are CPU-bound and a
    // small corpus arrives as one input partition — widen it (no-op at
    // real scale, where scans come pre-partitioned)
    val scrubbed = graft.util.Par.balance(df)
      .select(col(idCol).cast("long").as("id"),
        scrubOnce.as("text"))
    val c = col("text")
    val nTok = TextFns.tokenCount(c)
    val nChar = length(c).cast("long")
    val punctRatio = when(nChar > 0,
      round((nChar - length(regexp_replace(c, "[\\p{Punct}]", "")))
        .cast("double") / nChar, 4)).otherwise(lit(0.0))
    // lang_pred exactly as in [[languageId]]: unrounded argmax, ties to the
    // lexicographically-first language, all-zero → "und"
    val toks = tokens(c)
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l =>
      when(nTok > 0, countIn(toks, stopwords(l)).cast("double") / nTok)
        .otherwise(lit(0.0)))
    val best = greatest(scores: _*)
    val pick = langs.zip(scores).foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    scrubbed
      .filter(nTok >= minTokens && punctRatio <= maxPunctRatio &&
        pick === lang)
      .groupBy(xxhash64(col("text")).as("text_hash"))
      .agg(min("id").as("id"), min_by(col("text"), col("id")).as("clean_text"))
      .select(col("id"), col("clean_text"))
  }

  /** Heuristic language ID: per language, the fraction of tokens found in
    * its function-word dictionary; argmax wins with ties broken to the
    * FIRST language in ascending code order; all-zero scores → "und"
    * (undetermined).
    */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = TextFns.tokenCount(col(textCol))
    val scoreCols = stopwords.toSeq.sortBy(_._1).map { case (lang, dict) =>
      when(nTok > 0, countIn(toks, dict).cast("double") / nTok)
        .otherwise(lit(0.0)).as(s"score_$lang")
    }
    val scored = df.select(col(idCol).cast("long").as("id") +: scoreCols: _*)
    val langs = stopwords.keys.toSeq.sorted
    val best = greatest(langs.map(l => col(s"score_$l")): _*)
    val pick = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight means earlier (ascending) languages win ties
    scored.withColumn("lang_pred", pick)
      .select((Seq(col("id")) ++ langs.map(l => round(col(s"score_$l"), 4).as(s"score_$l"))
        :+ col("lang_pred")): _*)
  }
}
