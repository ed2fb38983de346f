// (PII scrub test appended at the bottom of this spec)
package graft

import org.apache.spark.sql.functions._

import graft.embed.HashEmbedder
import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeText collapses whitespace and lowercases") {
    val got = Seq("  Foo\t BAR \n baz  ").toDF("s")
      .select(TextFns.normalizeText(col("s"))).as[String].head()
    assert(got == "foo bar baz")
  }

  test("columnToText matches the reference sentence format (B6)") {
    val df = Seq(("hdr", 3L, 2L, 5L, 3.4, Seq("a", "bb", "ccc"))).toDF(
      "header", "n", "mn", "mx", "avg", "vals")
    val got = df.select(TextFns.columnToText(lit(""), col("header"), col("n"),
      col("mn"), col("mx"), col("avg"), col("vals"))).as[String].head()
    assert(got == "hdr contains 3 values (min=2, max=5, avg=3.4): a, bb, ccc")
    val withTitle = df.select(TextFns.columnToText(lit("My Table"), col("header"),
      col("n"), col("mn"), col("mx"), col("avg"), col("vals"))).as[String].head()
    assert(withTitle == "My Table hdr contains 3 values (min=2, max=5, avg=3.4): a, bb, ccc")
  }

  test("tokenCount: empty → 0, whitespace-separated words counted") {
    val got = Seq("", "   ", "one", "one two\tthree").toDF("s")
      .select(TextFns.tokenCount(col("s"))).as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L, 3L))
  }

  test("wordShingles produces n-token windows") {
    val got = Seq("a b c d").toDF("s")
      .select(TextFns.wordShingles(col("s"), 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("s")
      .select(TextFns.wordShingles(col("s"), 3)).as[Seq[String]].head()
    assert(short == Seq.empty)
  }

  test("embeddingPrompt assembles all conditional sections (F7)") {
    val df = Seq(("col_a", "alpha", "desc here", 3L, 2L, 5L, 3.42,
      Seq("x", "y"), Seq("x"))).toDF(
      "h", "ann", "desc", "nv", "mn", "mx", "av", "vs", "mc")
    val got = df.select(TextFns.embeddingPrompt(col("h"), col("ann"), col("desc"),
      col("nv"), col("mn"), col("mx"), col("av"), col("vs"), col("mc")))
      .as[String].head()
    assert(got ==
      """The attribute with header: 'col_a' has semantic annotation: 'alpha' and belongs to a table which is described as: 'desc here'
        |Examples of values for this attribute include: 'x, y'.
        |The dataset for column 'col_a' contains 3 entries.
        |Key statistics for the column:
        |- Maximum value length: 5 characters.
        |- Minimum value length: 2 characters.
        |- Average value length: 3.4 characters.
        |Top 20 most frequent values in the column:
        |x""".stripMargin)
    // NA annotation and empty metadata drop their sections entirely
    val sparse = Seq(("c", "NA", "", 0L, 0L, 0L, 0.0,
      Seq.empty[String], Seq.empty[String])).toDF(
      "h", "ann", "desc", "nv", "mn", "mx", "av", "vs", "mc")
    val got2 = sparse.select(TextFns.embeddingPrompt(col("h"), col("ann"),
      col("desc"), col("nv"), col("mn"), col("mx"), col("av"), col("vs"), col("mc")))
      .as[String].head()
    assert(got2 == "")
  }

  test("bpeIshTokenCount counts contraction suffixes and runs") {
    val got = Seq("it's 42 dogs, no-cats!", "").toDF("s")
      .select(TextFns.bpeIshTokenCount(col("s"))).as[Long].collect().toSeq
    // it|'s| 42| dogs|,| no|-|cats|! → 9
    assert(got == Seq(9L, 0L))
  }

  test("columnKey round-trips through keyTable/keyColumn") {
    val df = Seq(("orders", "o_custkey")).toDF("t", "c")
      .select(TextFns.columnKey(col("t"), col("c")).as("k"))
      .select(TextFns.keyTable(col("k")), TextFns.keyColumn(col("k")))
    assert(df.as[(String, String)].head() == ("orders", "o_custkey"))
  }

  test("HashEmbedder is deterministic, unit-norm, fixed-dim") {
    val e = HashEmbedder()
    val v1 = e.embed("hello world")
    val v2 = e.embed("hello world")
    assert(v1.toSeq == v2.toSeq)
    assert(v1.length == 64)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // similar texts are closer than dissimilar ones
    def d(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val near = d(e.embed("customer key id"), e.embed("customer key number"))
    val far = d(e.embed("customer key id"), e.embed("zebra quark flux"))
    assert(near < far)
  }

  test("scrubPii masks emails, URLs, IPs and phones; clean text untouched") {
    import graft.text.Analysis
    val rows = Seq(
      "write to jane.doe+x@corp.example.org today",
      "docs at https://docs.example.com/a?b=1 and more",
      "host 192.168.1.254 went down",
      "call 555-123-4567 or 555.123.4568",
      "a plain sentence, version 1.2 stays, v10.20.30 too",
      "mixed: bob@ex.io at http://ex.io/u/bob from 10.0.0.1 tel 555 123 4567")
      .toDF("text")
    val got = rows.select(Analysis.scrubPii(col("text")).as("c"))
      .as[String].collect().toSeq
    assert(got(0) == "write to <EMAIL> today")
    assert(got(1) == "docs at <URL> and more")
    assert(got(2) == "host <IP> went down")
    assert(got(3) == "call <PHONE> or <PHONE>")
    // short dotted versions are NOT IPs (need 4 octets), text unchanged
    assert(got(4) == "a plain sentence, version 1.2 stays, v10.20.30 too")
    assert(got(5) == "mixed: <EMAIL> at <URL> from <IP> tel <PHONE>")
  }

  test("winnowing fingerprints: guarantee, determinism, sparsity, short-text fallback") {
    import graft.text.Analysis
    val k = 8; val w = 4
    val common = "a very distinctive shared passage of text" // >> w+k-1 chars
    val rows = Seq(
      (1L, s"prefix one $common suffix alpha"),
      (2L, s"completely different opening $common and another tail"),
      (3L, "no overlap with anything else here at all whatsoever"),
      (4L, s"prefix one $common suffix alpha"), // exact dup of 1
      (5L, "tiny")) // shorter than k
    val got = rows.toDF("id", "text")
      .select(col("id"), Analysis.winnowingFingerprint(col("text"), k, w).as("fp"),
        length(col("text")).as("len"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getAs[scala.collection.Seq[Long]]("fp").toSeq, r.getInt(2)))
      .toMap
    // winnowing guarantee: a shared substring of >= w+k-1 chars forces a
    // shared fingerprint
    assert((got(1L)._1.toSet intersect got(2L)._1.toSet).nonEmpty)
    // identical text -> identical fingerprint set (deterministic)
    assert(got(1L)._1 == got(4L)._1)
    // unrelated text: no shared fingerprints with either
    assert((got(3L)._1.toSet intersect got(1L)._1.toSet).isEmpty)
    // sparsity: far fewer fingerprints than k-grams
    assert(got(1L)._1.size < got(1L)._2 - (k - 1))
    // short-text fallback: one whole-text hash
    assert(got(5L)._1.size == 1)
    // sorted-distinct contract
    got.values.foreach { case (fp, _) => assert(fp == fp.distinct.sorted) }
  }

  test("repetitionStats: hand-computed Gopher-rule metrics") {
    import spark.implicits._
    import graft.text.Analysis
    val docs = Seq(
      // lines ["a b","a b","c"]: dup_line 1-2/3; dup chars (3*2)/7;
      // words [a,b,a,b,c]: top bigram "a b"×2 → 2*3/9 chars
      (1L, "a b\na b\nc"),
      (2L, ""),                       // degenerate: all metrics 0
      (3L, "x y z"),                  // tie on count → "x y" wins: 3/5
      // all 4 lines dup; words split on ANY whitespace, so the bigram
      // "w w" spans line breaks: count 3 × len 3 / 7 chars (> 1 is legal
      // for the count×len definition — overlaps double-count)
      (4L, "w\nw\nw\nw")
    ).toDF("id", "text")
    val got = Analysis.repetitionStats(docs, "id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((3L, 0.3333, 0.8571, 0.6667)))
    assert(got(2L) == ((1L, 0.0, 0.0, 0.0)))
    assert(got(3L) == ((1L, 0.0, 0.0, 0.6)))
    assert(got(4L) == ((4L, 0.75, 1.0, 1.2857)))
  }

  test("contaminationCheck: exact shingle collisions with per-item fractions") {
    import spark.implicits._
    import graft.text.Analysis
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (2L, "totally different content with no shared phrases at all here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "w1 w2 w3 w4 w5 w6 w7 w8"),            // 1 shingle, fully in doc 1
      (101L, "w2 w3 w4 w5 w6 w7 w8 w9 x1"),          // 2 shingles, 1 in doc 1
      (102L, "a b c")                                 // < 8 words: no shingles
    ).toDF("bench_id", "text")
    val got = Analysis.contaminationCheck(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      (1L, 100L) -> ((1L, 1.0)),
      (1L, 101L) -> ((1L, 0.5))))
  }

  test("wordChunks: window/stride arithmetic incl. short docs and exact fits") {
    import spark.implicits._
    import graft.functions.TextFns
    def chunksOf(text: String, w: Int, st: Int): Seq[String] =
      Seq(text).toDF("t")
        .select(TextFns.wordChunks(col("t"), w, st).as("c"))
        .collect().head.getAs[scala.collection.Seq[String]](0).toSeq
    val ten = (1 to 10).map("w" + _).mkString(" ")
    // n=10, window=4, stride=2 → starts 1,3,5,7 (chunk at 7 reaches token
    // 10), nChunks = ceil(6/2)+1 = 4
    assert(chunksOf(ten, 4, 2) == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    // window ≥ n → single chunk, the whole doc
    assert(chunksOf("a b c", 10, 5) == Seq("a b c"))
    // exact fit: n = window → one chunk
    assert(chunksOf("a b c", 3, 1) == Seq("a b c"))
    // tail shorter than window: n=5, w=4, st=4 → [1..4], [5]
    assert(chunksOf("a b c d e", 4, 4) == Seq("a b c d", "e"))
    // empty / whitespace-only text → NO chunks (a phantom ''-chunk would
    // flow into a downstream embed stage)
    assert(chunksOf("", 4, 2) == Seq())
    assert(chunksOf("   ", 4, 2) == Seq())
    // gapped sampling (stride > window): starts stay inside the document —
    // no spurious trailing empty chunks
    assert(chunksOf(ten, 2, 4) == Seq("w1 w2", "w5 w6", "w9 w10"))
    assert(chunksOf(ten, 3, 7) == Seq("w1 w2 w3", "w8 w9 w10"))
    // n=10, w=2, st=9 → starts 1, 10; the last chunk is the short tail
    assert(chunksOf(ten, 2, 9) == Seq("w1 w2", "w10"))
  }

  test("topNgrams: counts, deterministic ties, exact k") {
    import spark.implicits._
    import graft.text.Analysis
    val docs = Seq(
      (1L, "a b a b a b"),     // "a b"×3, "b a"×2
      (2L, "a b c"),           // "a b", "b c"
      (3L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val got = Analysis.topNgrams(docs, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // "a b"×4, "b a"×2, "b c"×1 — ties impossible here; order pinned
    assert(got == Seq(("a b", 4L), ("b a", 2L), ("b c", 1L)))
    // tie-break: equal counts order by gram ascending at the cut
    val tied = Seq((1L, "x y"), (2L, "p q")).toDF("id", "text")
    val t1 = Analysis.topNgrams(tied, "text", n = 2, k = 1).collect()
    assert(t1.head.getString(0) == "p q")
  }

  test("dedupSubstrings: hand-traced span removal, self-repeats, blanks") {
    import spark.implicits._
    import graft.text.Analysis
    val docs = Seq(
      (1L, "a b c d e f"),      // shares span "a b c" with doc 2
      (2L, "x a b c y z"),      // → positions of the shared 3-gram drop
      (3L, "p q r p q r"),      // self-repeat: "p q r" occurs twice
      (4L, "unique tokens only here"),
      (5L, "   ")               // blank → untouched, 0 removed
    ).toDF("id", "text")
    val got = Analysis.dedupSubstrings(docs, "id", "text", l = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1: "a b c" covers pos 0-2 → "d e f" survives
    assert(got(1L) == (("d e f", 3L)))
    // doc 2: "a b c" covers pos 1-3 → "x y z" survives
    assert(got(2L) == (("x y z", 3L)))
    // doc 3: "p q r" at pos 0 and 3 → everything covered
    assert(got(3L) == (("", 6L)))
    // doc 4: no shared span
    assert(got(4L) == (("unique tokens only here", 0L)))
    assert(got(5L) == (("", 0L)))
    // overlapping shared spans cover the union of their positions:
    // "a b c d" and "b c d e" shared → doc 10 loses pos 0..4
    val ov = Seq(
      (10L, "a b c d e tail1 tail2 tail3"),
      (11L, "a b c d x"),
      (12L, "y b c d e")
    ).toDF("id", "text")
    val got2 = Analysis.dedupSubstrings(ov, "id", "text", l = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2(10L) == "tail1 tail2 tail3")
    assert(got2(11L) == "x")
    assert(got2(12L) == "y")
  }

  test("unigramLogProb: hand-computed smoothing, unseen tokens, blank docs") {
    import spark.implicits._
    import graft.text.Analysis
    val ref = Seq((0L, "a a b")).toDF("id", "text") // counts a:2 b:1, n=3 v=2
    val docs = Seq(
      (1L, "a b"),   // (ln(3/5) + ln(2/5)) / 2
      (2L, "z"),     // unseen: ln(1/5)
      (3L, "   ")    // blank → explicit zero branch
    ).toDF("id", "text")
    val got = Analysis.unigramLogProb(docs, "id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((2L, -0.7136)))
    assert(got(2L) == ((1L, -1.6094)))
    assert(got(3L) == ((0L, 0.0)))
    // a token-free reference fails loudly AT EXECUTION (raise_error —
    // constructing the plan must not run a job) instead of scoring every
    // doc NULL
    val blankRef = Seq((0L, "   ")).toDF("id", "text")
    val lazyPlan = Analysis.unigramLogProb(docs, "id", "text", blankRef, "text")
    val e = intercept[Exception](lazyPlan.collect())
    assert(e.getMessage.contains("reference corpus has no tokens"))
  }

  test("tfidfKeywords: hand-computed tf·idf ranking with ties") {
    import spark.implicits._
    import graft.text.Analysis
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian")
    ).toDF("id", "text")
    val got = Analysis.tfidfKeywords(docs, "id", "text", topK = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getString(1), r.getDouble(3)))
      .toMap
    // N=3; df: apple 1, banana 2, cherry 1, durian 1
    assert(got((1L, 1)) == (("apple", 2.1972)))  // 2·ln(3)
    assert(got((1L, 2)) == (("banana", 0.4055))) // 1·ln(1.5)
    assert(got((2L, 1)) == (("cherry", 1.0986)))
    assert(got((2L, 2)) == (("banana", 0.4055)))
    assert(got((3L, 1)) == (("durian", 1.0986)))
    assert(!got.contains((3L, 2)))
  }

  test("removeBoilerplateLines: strips saturated lines, preserves order") {
    import spark.implicits._
    import graft.text.Analysis
    val docs = Seq(
      (1L, "HEADER\nalpha\nbeta"),
      (2L, "HEADER\ngamma"),
      (3L, "HEADER\nHEADER\ndelta"),  // repeated within one doc: df counts once
      (4L, "HEADER")                  // all-boilerplate → empty survivor
    ).toDF("id", "text")
    val got = Analysis.removeBoilerplateLines(docs, "id", "text",
      minDocFreq = 4).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "alpha\nbeta", 2L -> "gamma", 3L -> "delta",
      4L -> ""))
    // below the threshold nothing is removed
    val loose = Analysis.removeBoilerplateLines(docs, "id", "text",
      minDocFreq = 5).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(loose(1L) == "HEADER\nalpha\nbeta" &&
      loose(3L) == "HEADER\nHEADER\ndelta")
    // blank lines are document structure, never boilerplate: every doc
    // having a paragraph separator must not merge everyone's paragraphs
    val para = Seq(
      (1L, "one\n\ntwo"), (2L, "three\n\nfour"), (3L, "five\n\nsix"),
      (4L, "seven\n\neight")).toDF("id", "text")
    val keptBlanks = Analysis.removeBoilerplateLines(para, "id", "text",
      minDocFreq = 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keptBlanks(1L) == "one\n\ntwo", s"got ${keptBlanks(1L)}")
    // minDocFreq <= 1 would empty every document — rejected loudly
    intercept[IllegalArgumentException](
      Analysis.removeBoilerplateLines(para, "id", "text", minDocFreq = 1))
  }

  test("qualityStats: NULL text scores as the empty document; word length " +
    "ignores padding whitespace") {
    import spark.implicits._
    import graft.text.Analysis
    val docs = Seq((1L, "  hi  "), (2L, "hello  world"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val got = Analysis.qualityStats(docs, "id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((1L, 6L, 2.0)),  // "hi": 2.0, not 6.0
      s"padding inflated avg_word_len: ${got(1L)}")
    assert(got(2L) == ((2L, 12L, 5.0)), // double space is one separator
      s"repeated separator counted: ${got(2L)}")
    assert(got(3L) == ((0L, 0L, 0.0)),  // NULL = empty doc, not NULL stats
      s"NULL text leaked: ${got(3L)}")
  }

  test("cleanCorpus rejects a lang no document can ever match") {
    import spark.implicits._
    import graft.text.Analysis
    val docs = Seq((1L, "the quick brown fox")).toDF("id", "text")
    val e = intercept[IllegalArgumentException](
      Analysis.cleanCorpus(docs, "id", "text", lang = "it"))
    assert(e.getMessage.contains("unknown lang"))
    // "und" is a legitimate bucket (the no-dictionary-match documents)
    assert(Analysis.cleanCorpus(docs, "id", "text", minTokens = 1,
      lang = "und").count() == 0) // an English doc is not und
  }

  test("packGreedy: hand-traced first-overflow packing, partition-stable") {
    import spark.implicits._
    import graft.text.Packing
    // budget 10, group g: sizes 4,4,4 → seqs 0,0,1; 12 overflows alone
    // into seq 2; 8 starts seq 3; 2 fits seq 3 (8+2 = 10 ≤ budget)
    val docs = Seq(
      ("g", 1L, 4L), ("g", 2L, 4L), ("g", 3L, 4L), ("g", 4L, 12L),
      ("g", 5L, 8L), ("g", 6L, 2L),
      ("h", 1L, 10L), ("h", 2L, 1L)
    ).toDF("src", "id", "sz")
    val got = Packing.packGreedy(docs, "id", "sz", "src", budget = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == Map(
      ("g", 1L) -> 0L, ("g", 2L) -> 0L, ("g", 3L) -> 1L, ("g", 4L) -> 2L,
      ("g", 5L) -> 3L, ("g", 6L) -> 3L,
      ("h", 1L) -> 0L, ("h", 2L) -> 1L))
    // repartitioning cannot change the per-group sorted pass
    val got2 = Packing.packGreedy(docs.repartition(7), "id", "sz", "src", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got2 == got)
    // every packed sequence respects the budget unless it is a single
    // oversized doc
    val seqs = Packing.packedSequences(
      Packing.packGreedy(docs, "id", "sz", "src", 10L)).collect()
    seqs.foreach { r =>
      assert(r.getLong(3) <= 10L || r.getLong(2) == 1L,
        s"overfull multi-doc sequence: $r")
    }
  }

  test("repetitionStats: doubling a document pushes every line to dup") {
    import graft.text.Analysis
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Lake.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).limit(50)
    val doubled = docs.select(col("doc_id"),
      concat(col("text"), lit("\n"), col("text")).as("text"))
    val stats = Analysis.repetitionStats(doubled, "doc_id", "text")
    // every line occurs at least twice → dup_line_char_frac = 1 whenever
    // the doc has any line characters at all
    assert(stats.filter(col("dup_line_char_frac") < 1.0)
      .filter(col("n_lines") > 0).count() == 0)
  }
}
