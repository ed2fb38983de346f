package graft

import org.apache.spark.sql.functions._

import graft.text.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("scoreTopK matches the hand-computed BM25 formula") {
    // corpus: d1 = "cat sat" (dl 2), d2 = "cat cat dog" (dl 3),
    // d3 = "fish" (dl 1). N = 3, avgdl = 2.
    val docs = Seq((1L, "cat sat"), (2L, "cat cat dog"), (3L, "fish"))
      .toDF("id", "text")
    val q = Seq((10L, "cat dog")).toDF("qid", "qtext")
    val got = Bm25.scoreTopK(docs, "id", "text", q, "qid", "qtext",
        topK = 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toList.sortBy(_._3)

    val k1 = 1.2; val b = 0.75
    def idf(df: Int) = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    def w(tf: Int, dl: Int) =
      tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 2.0))
    // d2: cat tf=2 (df 2), dog tf=1 (df 1); d1: cat tf=1
    val d2 = round4(idf(2) * w(2, 3) + idf(1) * w(1, 3))
    val d1 = round4(idf(2) * w(1, 2))
    assert(got == List((2L, d2, 1), (1L, d1, 2)))
  }

  test("TermFreqs kernel: counts, normalization, ordering, null/blank, SQL-tokenizer parity") {
    import org.apache.spark.sql.graft.{Interop, TermFreqs}
    def tf(s: String): Seq[(String, Long)] = {
      val df = Seq(Tuple1(s)).toDF("t")
        .select(explode(Interop.column(TermFreqs(
          Interop.expression(coalesce(col("t"), lit("")))))).as("r"))
        .select(col("r.term"), col("r.tf"))
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    // counts + lowercasing + term-byte-sorted output
    assert(tf("Cat sat CAT  dog") == Seq(("cat", 2L), ("dog", 1L), ("sat", 1L)))
    // whitespace variety collapses exactly like the SQL toks pipeline
    assert(tf("  a\tb\na a ") == Seq(("a", 3L), ("b", 1L)))
    // blank and null yield EMPTY (never null) — blank docs index nothing
    assert(tf("") == Seq.empty && tf("   ") == Seq.empty)
    assert(tf(null) == Seq.empty)
    // parity with the SQL-side tokenizer on every documents row: the
    // kernel's exploded terms must equal split+filter term-for-term
    val docs = graft.sources.Lake.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val kernel = docs.select(col("doc_id"),
        explode(Interop.column(TermFreqs(
          Interop.expression(coalesce(col("text"), lit("")))))).as("r"))
      .select(col("doc_id"), col("r.term").as("term"), col("r.tf").as("tf"))
    val sql = docs.select(col("doc_id"),
        explode(split(trim(lower(coalesce(col("text"), lit("")))), "\\s+"))
          .as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    assert(kernel.exceptAll(sql).isEmpty && sql.exceptAll(kernel).isEmpty,
      "TermFreqs kernel drifted from the SQL split/lower/trim tokenizer")
  }

  test("empty docs are absent from N/avgdl; no-hit queries yield no rows") {
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, null), (4L, "  "))
      .toDF("id", "text")
    val q = Seq((1L, "alpha"), (2L, "zzz"), (3L, "")).toDF("qid", "qtext")
    val got = Bm25.scoreTopK(docs, "id", "text", q, "qid", "qtext")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // only query 1 hits; N=1 (just d1), df=1 → idf = ln(1 + 0.5/1.5)
    assert(got.toSeq == Seq((1L, 1L)))
    // score check: tf=1, dl=2=avgdl → tf weight = (k1+1)/(1+k1) = 1
    val s = Bm25.scoreTopK(docs, "id", "text", q, "qid", "qtext")
      .collect().head.getDouble(2)
    assert(s == round4(math.log(4.0 / 3.0)))
  }

  test("ranking is stable across input partitioning") {
    val docs = (1L to 60L)
      .map(i => (i, s"tok${i % 9} tok${i % 4} shared word${i % 11}"))
      .toDF("id", "text")
    val q = Seq((1L, "tok1 shared"), (2L, "word3 tok2")).toDF("qid", "qtext")
    val a = Bm25.scoreTopK(docs, "id", "text", q, "qid", "qtext", topK = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = Bm25.scoreTopK(docs.repartition(13), "id", "text",
        q.repartition(3), "qid", "qtext", topK = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("rrfFuse sums reciprocal ranks across lists, ties broken by id") {
    val lex = Seq((1L, 100L, 1), (1L, 101L, 2)).toDF("q", "id", "rnk")
    val dense = Seq((1L, 101L, 1), (1L, 102L, 2)).toDF("q", "id", "rnk")
    val got = Bm25.rrfFuse(Seq(lex, dense), "q", "id", "rnk", k0 = 60)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toList.sortBy(_._3)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 101 in both lists (1/62 + 1/61) beats 100 (1/61) beats 102 (1/62)
    assert(got == List(
      (101L, r6(1.0 / 62 + 1.0 / 61), 1),
      (100L, r6(1.0 / 61), 2),
      (102L, r6(1.0 / 62), 3)))
    // exact tie (same single-list rank) breaks by id ascending
    val t1 = Seq((1L, 7L, 3)).toDF("q", "id", "rnk")
    val t2 = Seq((1L, 5L, 3)).toDF("q", "id", "rnk")
    val tied = Bm25.rrfFuse(Seq(t1, t2), "q", "id", "rnk")
      .collect().map(r => (r.getLong(1), r.getInt(3))).toList.sortBy(_._2)
    assert(tied == List((5L, 1), (7L, 2)))
  }

  test("rrfFuse hybrid of BM25 and a dense ranking promotes both-list hits") {
    val docs = Seq(
      (1L, "red apple pie"), (2L, "green apple tart"), (3L, "blue sky"))
      .toDF("id", "text")
    val q = Seq((1L, "apple")).toDF("qid", "qtext")
    val lex = Bm25.scoreTopK(docs, "id", "text", q, "qid", "qtext")
      .select(col("query_id"), col("id"), col("rnk"))
    // a dense leg that ranks doc 3 first but agrees on doc 2
    val dense = Seq((1L, 3L, 1), (1L, 2L, 2)).toDF("query_id", "id", "rnk")
    val fused = Bm25.rrfFuse(Seq(lex, dense), "query_id", "id", "rnk")
      .collect().map(r => (r.getLong(1), r.getInt(3))).toList.sortBy(_._2)
    // doc 2 appears in both lists → fused rank 1
    assert(fused.head._1 == 2L)
    assert(fused.map(_._1).toSet == Set(1L, 2L, 3L))
  }
}
