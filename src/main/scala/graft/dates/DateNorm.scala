package graft.dates

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-format date normalization → `"dd MMMM yyyy"` ("01 March 2024") —
  * reference: SemLink/data_loader.py:20–133 (branch order kept):
  * quarters `YYYY-QX` → month (q−1)·3+1; `YYYY-MM`; semesters
  * `YYYY-S1/S2/H1/H2` → month 1/7; `YYYYMMDD`; `MM/YYYY`; `MM-YYYY`;
  * textual month-year; then a strptime fallback chain; unparseable → null.
  *
  * Built as a pure when/coalesce/try_to_date expression tree — fully
  * codegen-friendly, no UDF (SURVEY.md §7.3.1). `try_*` keeps it total
  * under ANSI mode (Spark 4 default).
  *
  * Note the reference's own semester branch is dead code (missing
  * `import re`, data_loader.py:69) — we implement the intent.
  */
object DateNorm {

  private val monthNames = Seq(
    "january" -> "Jan", "february" -> "Feb", "march" -> "Mar",
    "april" -> "Apr", "may" -> "May", "june" -> "Jun", "july" -> "Jul",
    "august" -> "Aug", "september" -> "Sep", "october" -> "Oct",
    "november" -> "Nov", "december" -> "Dec")

  /** Normalize English month tokens (full or abbreviated, any case) to
    * canonical 3-letter form so strict `MMM` parsing applies: initcap
    * fixes the case, then full names collapse to abbreviations (12 rewrites
    * — the chain is inlined into several parse branches, so size matters
    * for codegen compile time).
    */
  private def canonMonths(c: Column): Column =
    monthNames.foldLeft(initcap(lower(c))) { case (acc, (full, abbr)) =>
      regexp_replace(acc, s"\\b${full.capitalize}\\b", abbr)
    }

  private def tryDates(c: Column, fmts: Seq[String]): Seq[Column] =
    fmts.map(f => try_to_date(c, f))

  private def tryTimestamps(c: Column, fmts: Seq[String]): Seq[Column] =
    fmts.map(f => try_to_timestamp(c, lit(f)).cast("date"))

  /** Parse one date string to a DateType value (null when unparseable).
    * Branch structure: cheap regex-guarded special forms first (quarter,
    * semester, year-month, compact, month-year), then the numeric strptime
    * fallback chain, and only for inputs containing letters the textual
    * month forms (the canonMonths subtree is confined to those branches so
    * the all-numeric path stays small — codegen compile time scales with
    * tree size).
    */
  def parseDate(raw: Column): Column = {
    val s = trim(raw)
    val year4 = substring(s, 1, 4).cast("int")

    val quarter = when(s.rlike("^\\d{4}-[Qq][1-4]$"),
      make_date(year4, (substring(s, 7, 1).cast("int") - 1) * 3 + 1, lit(1)))
    val semester = when(s.rlike("^\\d{4}-[SsHh][12]$"),
      make_date(year4,
        when(substring(s, 7, 1) === "1", 1).otherwise(7), lit(1)))
    val yearMonth = when(s.rlike("^\\d{4}-\\d{1,2}$"), try_to_date(s, "yyyy-M"))
    val compact = when(s.rlike("^\\d{8}$"), try_to_date(s, "yyyyMMdd"))
    val monthSlashYear = when(s.rlike("^\\d{1,2}/\\d{4}$"), try_to_date(s, "M/yyyy"))
    val monthDashYear = when(s.rlike("^\\d{1,2}-\\d{4}$"), try_to_date(s, "M-yyyy"))

    // numeric strptime fallback chain (data_loader.py:88–110 order)
    val numericFallback =
      tryDates(s, Seq(
        "yyyy-M-d", "d/M/yyyy", "yyyy/M/d", "d-M-yyyy", "yyyy",
        "d.M.yyyy", "M/d/yyyy", "yyyy.M.d")) ++
      tryTimestamps(s, Seq(
        "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd'T'HH:mm",
        "d/M/yyyy HH:mm", "d/M/yyyy HH:mm:ss"))

    // textual month forms — single guarded branch holding the canon subtree
    val textual = when(s.rlike("[A-Za-z]"), {
      val c = canonMonths(s)
      coalesce(
        try_to_date(c, "MMM yyyy"),
        try_to_date(c, "d MMM yyyy"),
        try_to_date(c, "MMM d, yyyy"))
    })

    coalesce((Seq(quarter, semester, yearMonth, compact, monthSlashYear,
      monthDashYear) ++ numericFallback :+ textual): _*)
  }

  /** Full normalizer: string in, `"dd MMMM yyyy"` string (or null) out. */
  def normalizeDate(raw: Column): Column =
    date_format(parseDate(raw), "dd MMMM yyyy")
}
