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

  /** Approximate token-cap truncation. The reference truncates to 2048
    * tiktoken cl100k tokens (SemLink/join_discoverer.py:34–62, 209); no
    * tiktoken exists on the JVM, so we cap by characters at the documented
    * ~4 chars/token heuristic. Relational semantics are unaffected.
    */
  def truncateTokens(c: Column, maxTokens: Int = 2048, charsPerToken: Int = 4): Column =
    substring(c, 1, maxTokens * charsPerToken)

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
}
