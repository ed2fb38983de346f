package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeTokenizer, TextFns}

/** F8 token-exact BPE: engine unit cases hand-computed against the
  * bundled merge table, truncation contracts, and the Spark expression
  * surface (codegen span, null propagation).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val bpe = BpeTokenizer.bundled

  test("tokenization matches hand-computed merges on the bundled table") {
    // "the": t h -> th (rank 1), th e -> the (rank 3)
    assert(bpe.tokens("the") == Seq("the"))
    // " the": Ġ t (0) -> Ġt h (2) -> Ġth e (4): one token for the
    // space-prefixed word, as in published GPT-2-family tables
    assert(bpe.tokens(" the") == Seq("Ġthe"))
    // "that": th + at (no "th at" merge exists)
    assert(bpe.tokens("that") == Seq("th", "at"))
    // " that": Ġt -> Ġth -> (a t) -> Ġth at
    assert(bpe.tokens(" that") == Seq("Ġthat"))
    // pre-token boundary: contractions split first
    assert(bpe.countTokens("that is") == 3) // [th, at, Ġis]
    // double space: non-final whitespace keeps its last char for the
    // next pre-token (GPT-2 lookahead), so "a  b" = [a][Ġ][Ġb]
    assert(bpe.countTokens("a  b") == 3)
    assert(bpe.countTokens("") == 0)
  }

  test("truncate keeps exactly the first k tokens and decodes them") {
    // "the theme" tokens: [the][Ġthe][m][e]
    assert(bpe.tokens("the theme") == Seq("the", "Ġthe", "m", "e"))
    assert(bpe.truncate("the theme", 0) == "")
    assert(bpe.truncate("the theme", 1) == "the")
    assert(bpe.truncate("the theme", 2) == "the the")
    assert(bpe.truncate("the theme", 3) == "the them")
    assert(bpe.truncate("the theme", 4) == "the theme")
    assert(bpe.truncate("the theme", 99) == "the theme") // cap beyond length: no-op
  }

  test("a cut inside a multi-byte UTF-8 sequence drops the dangling fragment") {
    // "café" = bytes [c a f C3 A9], no merges apply -> 5 byte tokens;
    // cutting after C3 must not emit a mangled char
    assert(bpe.countTokens("café") == 5)
    assert(bpe.truncate("café", 4) == "caf")
    assert(bpe.truncate("café", 5) == "café")
  }

  test("invalid UTF-16 input: truncation contracts still hold") {
    // an unpaired surrogate is lossy through UTF-8 by definition; the
    // truncation must still be a char-exact prefix and below-cap inputs
    // must pass through byte-identically (no surrogate rewritten to '?')
    val bad = "the \uD800 theme" // lone high surrogate mid-text
    assert(bpe.truncate(bad, Int.MaxValue) == bad)
    for (k <- 0 to 10) {
      val trunc = bpe.truncate(bad, k)
      assert(bad.startsWith(trunc), s"k=$k: '$trunc' not a prefix")
    }
  }

  test("merges-format parsing and custom tables") {
    val custom = BpeTokenizer.fromMergesLines(Iterator(
      "#version: demo", "", "a b", "ab c"))
    assert(custom.tokens("abc") == Seq("abc"))
    assert(custom.tokens("cab") == Seq("c", "ab"))
    intercept[IllegalArgumentException](
      BpeTokenizer.fromMergesLines(Iterator("a b c")))
  }

  test("Spark expressions: count/truncate columns, null propagation") {
    val df = Seq(
      (1L, "the theme"),
      (2L, "that is"),
      (3L, ""),
      (4L, null: String)).toDF("id", "text")
    val got = df.select(col("id"),
        TextFns.bpeTokenCountExact(col("text")).as("n"),
        TextFns.truncateTokensExact(col("text"), 2).as("t"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1),
         if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(got(1L) == (4L, "the the"))
    assert(got(2L) == (3L, "that"))   // [th, at] both kept, Ġis cut
    assert(got(3L) == (0L, ""))
    assert(got(4L) == (null, null))
  }

  test("expressions stay inside whole-stage codegen over a real scan") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(TextFns.bpeTokenCountExact(col("text")).as("n"),
        TextFns.truncateTokensExact(col("text"), 16).as("t"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("bpe_token_count") && l.contains("*(")),
      s"bpe_token_count fell out of the codegen span:\n$plan")
  }

  test("truncation contracts hold across the documents corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(200)
      .select(col("text"),
        TextFns.bpeTokenCountExact(col("text")).as("n_tok"),
        TextFns.truncateTokensExact(col("text"), 16).as("trunc"))
      .collect()
    docs.foreach { r =>
      val text = r.getString(0)
      val n = r.getLong(1)
      val trunc = r.getString(2)
      assert(text.startsWith(trunc), "truncation must be a prefix")
      assert(bpe.countTokens(trunc) <= 16, s"re-encoded cap violated for: $trunc")
      if (n <= 16) assert(trunc == text, "below-cap truncation must be a no-op")
      else assert(trunc.length < text.length, "above-cap truncation must cut")
      // definitional: the kept bytes are exactly the first 16 tokens
      assert(trunc == bpe.truncate(text, 16))
    }
  }
}
