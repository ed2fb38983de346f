package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions (SURVEY.md §2.8 F2–F7) as pure Column builders —
  * everything stays inside whole-stage codegen (no UDFs).
  */
object TextFns {

  /** Whitespace-collapse + lowercase normalization —
    * `" ".join(text.strip().lower().split())`
    * (reference: DeepJoin/search_query.py:16–17).
    */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** snake-ish header normalization: lower + space/dash → underscore
    * (reference: SemanticAnnotation/json_parser.py:110).
    */
  def snakeNormalize(c: Column): Column =
    translate(lower(c), " -", "__")

  /** `"table:column"` composite key (reference:
    * SemLink/join_discoverer.py:218; split contract :321–322).
    */
  def columnKey(table: Column, column: Column): Column =
    concat_ws(":", table, column)

  def keyTable(key: Column): Column = split(key, ":").getItem(0)
  def keyColumn(key: Column): Column = split(key, ":").getItem(1)

  /** Column-to-text serialization (reference:
    * DeepJoin/repositoryLoader.py:161–180; FIXTURES.md §B6):
    * `"<title> <header> contains <n> values (min=<a>, max=<b>, avg=<c:.1f>): v1, v2, ..."`
    * `title` may be empty → leading part dropped via concat_ws.
    */
  def columnToText(
      title: Column,
      header: Column,
      numValues: Column,
      minLen: Column,
      maxLen: Column,
      avgLen: Column,
      valuesSample: Column): Column =
    concat_ws(" ",
      when(length(coalesce(title, lit(""))) > 0, trim(title)),
      concat(
        trim(header),
        format_string(" contains %d values (min=%d, max=%d, avg=%.1f): ",
          coalesce(numValues, lit(0L)),
          coalesce(minLen, lit(0L)),
          coalesce(maxLen, lit(0L)),
          coalesce(avgLen, lit(0.0))),
        concat_ws(", ", valuesSample)))

  /** Embedding-prompt builder (F7 — reference:
    * SemLink/join_discoverer.py:64–127): multi-line prompt with
    * conditional sections, joined by newlines —
    *  - annotation line (only when the annotation is not the 'NA'
    *    sentinel), optionally extended with the table description;
    *  - value examples (when the sample is non-empty);
    *  - entry count (when > 0);
    *  - length statistics block (when min and max are both > 0;
    *    avg rendered with one decimal);
    *  - top-20 most frequent values (when present).
    */
  def embeddingPrompt(
      header: Column,
      semanticAnnotation: Column,
      tableDescription: Column,
      numValues: Column,
      minLen: Column,
      maxLen: Column,
      avgLen: Column,
      valuesSample: Column,
      mostCommonValues: Column): Column = {
    val ann = coalesce(semanticAnnotation, lit("NA"))
    val desc = coalesce(tableDescription, lit(""))
    val examples = concat_ws(", ", coalesce(valuesSample, array()))
    val topVals = concat_ws(", ",
      slice(coalesce(mostCommonValues, array()), 1, 20))

    val annotationLine = when(ann =!= "NA",
      concat(
        format_string("The attribute with header: '%s' has semantic annotation: '%s'",
          header, ann),
        when(length(desc) > 0,
          format_string(" and belongs to a table which is described as: '%s'", desc))
          .otherwise(lit("."))))
    val examplesLine = when(length(examples) > 0,
      format_string("Examples of values for this attribute include: '%s'.", examples))
    val entriesLine = when(coalesce(numValues, lit(0L)) > 0,
      format_string("The dataset for column '%s' contains %d entries.",
        header, numValues))
    val statsBlock = when(coalesce(maxLen, lit(0L)) > 0 && coalesce(minLen, lit(0L)) > 0,
      concat_ws("\n",
        lit("Key statistics for the column:"),
        format_string("- Maximum value length: %d characters.", maxLen),
        format_string("- Minimum value length: %d characters.", minLen),
        format_string("- Average value length: %.1f characters.", avgLen)))
    val topBlock = when(size(coalesce(mostCommonValues, array())) > 0,
      concat_ws("\n", lit("Top 20 most frequent values in the column:"), topVals))

    concat_ws("\n", annotationLine, examplesLine, entriesLine, statsBlock, topBlock)
  }

  /** BPE-ish token counting: a GPT-2-style pre-tokenizer regex (contraction
    * suffixes, letter runs, digit runs, punctuation runs, whitespace) —
    * the added-scope approximation of subword token counts without a
    * vocabulary.
    */
  def bpeIshTokenCount(c: Column): Column =
    size(regexp_extract_all(c,
      lit("'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"), lit(0)))
      .cast("long")

  /** Approximate token-cap truncation — the vocabulary-free estimator
    * (~4 chars/token for English text). The reference truncates to 2048
    * tiktoken cl100k tokens (SemLink/join_discoverer.py:34–62, 209); for
    * token-EXACT truncation against a loaded BPE merge table use
    * [[truncateTokensExact]]. Error bound of the estimate: with the GPT-2
    * pre-tokenizer every token covers ≥ 1 character, so a `maxTokens`
    * cap is guaranteed only by `charsPerToken = 1`; the default 4 targets
    * the observed English average instead (a soft cap).
    */
  def truncateTokens(c: Column, maxTokens: Int = 2048, charsPerToken: Int = 4): Column =
    substring(c, 1, maxTokens * charsPerToken)

  /** Token-EXACT BPE token count under the tokenizer's merge table
    * (default: the bundled demo vocabulary; load a model's published
    * `merges.txt` via [[BpeTokenizer.fromMergesFile]] for that model's
    * exact boundaries). Native codegen expression, memoized per
    * pre-token.
    */
  def bpeTokenCountExact(
      c: Column, tokenizer: BpeEngine = BpeTokenizer.bundled): Column =
    org.apache.spark.sql.graft.Interop.column(
      org.apache.spark.sql.graft.BpeTokenCount(
        org.apache.spark.sql.graft.Interop.expression(c), tokenizer))

  /** Token-EXACT truncation: keeps exactly the first `maxTokens` BPE
    * tokens (F8 — the tiktoken-cap contract of join_discoverer.py:34–62,
    * re-expressed over a loadable merge table).
    */
  def truncateTokensExact(
      c: Column, maxTokens: Int,
      tokenizer: BpeEngine = BpeTokenizer.bundled): Column =
    org.apache.spark.sql.graft.Interop.column(
      org.apache.spark.sql.graft.BpeTruncate(
        org.apache.spark.sql.graft.Interop.expression(c), tokenizer, maxTokens))

  /** Whitespace token count (text-analysis added scope). */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0L))
      .otherwise(size(split(trim(c), "\\s+")).cast("long"))

  /** Word shingles (n-gram sequences of whitespace tokens) for dedup.
    * Empty array when fewer than n tokens (`sequence(1, 0)` would count
    * DOWN in Spark, so the short case needs an explicit guard).
    */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = split(trim(c), "\\s+")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Sliding word-window chunks: `window` tokens per chunk, starts every
    * `stride` tokens, stopping once a chunk has reached the last token —
    * the standard long-document split ahead of an embedding model's
    * context limit (stride < window ⟹ overlapping context; stride >
    * window ⟹ gapped sampling, where chunks stop at the last start
    * still inside the document and the tail between starts is skipped by
    * construction). A non-empty document shorter than `window` yields
    * exactly one chunk; an empty or whitespace-only document yields NO
    * chunks (split of '' gives [''], which would otherwise surface as a
    * phantom empty-string chunk for a downstream embed stage to process);
    * tokenization matches [[wordShingles]] (whitespace runs on the
    * trimmed text).
    */
  def wordChunks(c: Column, window: Int, stride: Int): Column = {
    require(window > 0 && stride > 0, "wordChunks: window and stride must be > 0")
    val toks = split(trim(c), "\\s+")
    val n = size(toks)
    // last chunk = the first one reaching the last token, capped at the
    // last start inside the document — without the cap, stride > window
    // would emit starts past the end as spurious empty chunks
    val lastK = least(
      ceil((n - window).cast("double") / stride).cast("long"),
      floor((n - 1).cast("double") / stride).cast("long"))
    val nChunks = when(n <= window, lit(1L)).otherwise(lastK + 1L)
    when(trim(c) === "", array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0L), nChunks - 1L),
        k => concat_ws(" ", slice(toks, (k * stride + 1).cast("int"), lit(window)))))
  }
}
