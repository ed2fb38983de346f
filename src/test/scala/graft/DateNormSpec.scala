package graft

import org.apache.spark.sql.functions._

import graft.dates.DateNorm

/** Every branch of the reference's normalizer (data_loader.py:50–130;
  * FIXTURES.md §B7) as a table-driven test.
  */
class DateNormSpec extends SparkSpec {
  import spark.implicits._

  private val cases: Seq[(String, Option[String])] = Seq(
    "2024-Q3" -> Some("01 July 2024"),
    "2005-03" -> Some("01 March 2005"),
    "2023-S1" -> Some("01 January 2023"),
    "2023-S2" -> Some("01 July 2023"),
    "2023-H2" -> Some("01 July 2023"),
    "20230101" -> Some("01 January 2023"),
    "03/2024" -> Some("01 March 2024"),
    "03-2024" -> Some("01 March 2024"),
    "Jan 2023" -> Some("01 January 2023"),
    "January 2023" -> Some("01 January 2023"),
    "2023-01-15" -> Some("15 January 2023"),
    "15/01/2023" -> Some("15 January 2023"),
    "2023/01/15" -> Some("15 January 2023"),
    "15-01-2023" -> Some("15 January 2023"),
    "2023" -> Some("01 January 2023"),
    "15.01.2023" -> Some("15 January 2023"),
    "01/15/2023" -> Some("15 January 2023"), // dd/MM fails (month 15) → MM/dd
    "2023.01.15" -> Some("15 January 2023"),
    "15 Jan 2023" -> Some("15 January 2023"),
    "15 January 2023" -> Some("15 January 2023"),
    "Jan 15, 2023" -> Some("15 January 2023"),
    "2023-01-15T10:30:00" -> Some("15 January 2023"),
    "2023-01-15T10:30" -> Some("15 January 2023"),
    "15/01/2023 10:30" -> Some("15 January 2023"),
    "15/01/2023 10:30:00" -> Some("15 January 2023"),
    "  2024-Q1  " -> Some("01 January 2024"), // trimmed
    "n/a" -> None,
    "" -> None,
    "13/2024" -> None, // month 13
    "2024-Q5" -> None,
    "garbage" -> None)

  test("normalize_date covers every reference format branch") {
    val df = cases.map(_._1).toDF("raw")
      .withColumn("norm", DateNorm.normalizeDate(col("raw")))
    val got = df.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    cases.foreach { case (raw, expected) =>
      assert(got(raw) == expected, s"input '$raw'")
    }
  }

  test("ambiguous day/month prefers day-first (reference order)") {
    val got = Seq("01/02/2023").toDF("raw")
      .select(DateNorm.normalizeDate(col("raw"))).as[String].head()
    assert(got == "01 February 2023")
  }
}
