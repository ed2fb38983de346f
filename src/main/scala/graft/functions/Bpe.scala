package graft.functions

import java.nio.charset.{CodingErrorAction, StandardCharsets}
import java.util.regex.Pattern

/** The token-exact tokenizer contract behind the F8 expressions
  * ([[TextFns.bpeTokenCountExact]]/[[TextFns.truncateTokensExact]]): two
  * interchangeable byte-level BPE engines implement it — [[BpeTokenizer]]
  * (GPT-2 `merges.txt` format + GPT-2 pre-tokenizer) and
  * [[TiktokenBpe]] (`.tiktoken` base64-rank format + cl100k pre-
  * tokenizer, the reference's actual operating point). Load either via
  * [[BpeEngine.fromVocabFile]], which sniffs the format.
  */
trait BpeEngine extends Serializable {
  /** Exact token count of `text` under this engine's vocabulary. */
  def countTokens(text: String): Long
  /** Keep exactly the first `maxTokens` tokens; always a prefix of the
    * input, identity when the input is below the cap.
    */
  def truncate(text: String, maxTokens: Int): String
}

object BpeEngine {
  /** Load a vocabulary file as the right engine: `.tiktoken` exports
    * (every line `base64(tokenBytes) rank`) become a [[TiktokenBpe]] with
    * the cl100k pre-tokenizer; anything else is parsed as GPT-2
    * `merges.txt` (one `left right` merge pair per line).
    */
  def fromVocabFile(path: String): BpeEngine = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val lines = src.getLines().toVector
      if (looksTiktoken(lines)) TiktokenBpe.fromTiktokenLines(lines.iterator)
      else BpeTokenizer.fromMergesLines(lines.iterator)
    } finally src.close()
  }

  /** Conventional install path of the published cl100k export, relative
    * to the working directory — where `scripts/fetch_cl100k.sh` puts it.
    * CWD-relative by design: it serves repo-rooted runs (tests, the
    * correctness driver). A deployment whose driver launches from an
    * arbitrary CWD (spark-submit under a scheduler) must use the
    * `GRAFT_TIKTOKEN_VOCAB` env var — the production mechanism — and can
    * confirm which vocabulary actually ran via the q44 gate's `vocab`
    * column or [[resolveDefaultNamed]]'s label.
    */
  val ConventionalCl100kPath = "data/cl100k_base.tiktoken"

  /** The deployment's token-exact engine with its provenance label:
    *
    *  1. the vocabulary file named by `GRAFT_TIKTOKEN_VOCAB` when set
    *     (label = the file's basename, either format, sniffed);
    *  2. else [[ConventionalCl100kPath]] when present (label =
    *     `cl100k_base` — run `scripts/fetch_cl100k.sh` once in a
    *     connected deployment for reference-exact token boundaries,
    *     join_discoverer.py:34–62);
    *  3. else the bundled demo tiktoken vocabulary (label = `demo` —
    *     this offline build cannot fetch the ~1.7 MB export, so
    *     truncation is format-correct but not reference-token-exact).
    *
    * `env` is injectable for tests; callers use the default.
    */
  def resolveDefaultNamed(env: Map[String, String] = sys.env): (BpeEngine, String) =
    env.get("GRAFT_TIKTOKEN_VOCAB")
      .filter(p => new java.io.File(p).isFile)
      .map(p => (fromVocabFile(p),
        new java.io.File(p).getName.replaceAll("\\.[^.]*$", "")))
      .orElse {
        val conv = new java.io.File(ConventionalCl100kPath)
        if (conv.isFile) Some((fromVocabFile(conv.getPath), "cl100k_base"))
        else None
      }
      .getOrElse((TiktokenBpe.bundledDemo, "demo"))

  /** [[resolveDefaultNamed]] without the provenance label. */
  def resolveDefault(env: Map[String, String] = sys.env): BpeEngine =
    resolveDefaultNamed(env)._1

  private[functions] def looksTiktoken(lines: Seq[String]): Boolean =
    lines.iterator.map(_.trim)
      .find(l => l.nonEmpty && !l.startsWith("#"))
      .exists { l =>
        l.split(" ") match {
          case Array(tok, rank) =>
            rank.forall(_.isDigit) &&
              scala.util.Try(java.util.Base64.getDecoder.decode(tok)).isSuccess
          case _ => false
        }
      }
}

/** Byte-level BPE tokenizer — the public GPT-2 algorithm (Sennrich BPE
  * over a 256-symbol byte alphabet with the GPT-2 pre-tokenizer): the
  * token-exact backend for F8 truncation (the reference truncates prompts
  * to tiktoken caps, SemLink/join_discoverer.py:34–62, :209).
  *
  * The engine is vocabulary-agnostic: it loads any merges export in the
  * standard GPT-2 `merges.txt` format (one space-separated pair per line,
  * rank = line order, optional `#version` header), so a deployment drops
  * in its model's published merge table and gets that model's token
  * boundaries bit-for-bit. A small bundled demo vocabulary
  * (`graft/bpe_merges.txt`) backs the specs; the char-estimate
  * [[TextFns.truncateTokens]] remains the vocabulary-free default.
  *
  * Determinism/scale notes: tokenization is per pre-token with an
  * executor-local memo cache (natural-language corpora repeat pre-tokens
  * heavily); merges ship in the task binary (a 50k-merge table is ~1 MB).
  */
final class BpeTokenizer(merges: Seq[(String, String)]) extends BpeEngine {

  private val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

  /** Executor-local pre-token memo (bounded; cleared when full). */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val cacheMax = 65536

  import BpeTokenizer.{byteDecoder, byteEncoder, pretokenPattern}

  /** BPE merge loop for one pre-token: greedily merge the lowest-ranked
    * adjacent pair until none applies (GPT-2 `bpe()`); symbols live in the
    * byte-to-unicode alphabet.
    */
  private def bpe(pretoken: String): Array[String] = {
    val cached = cache.get(pretoken)
    if (cached != null) return cached
    val bytes = pretoken.getBytes(StandardCharsets.UTF_8)
    var word = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      word(i) = String.valueOf(byteEncoder(bytes(i) & 0xff)); i += 1
    }
    var done = word.length <= 1
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < word.length - 1) {
        val r = ranks.getOrElse((word(j), word(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = j }
        j += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) done = true
      else {
        val a = word(best)
        val b = word(best + 1)
        val merged = a + b
        val out = Array.newBuilder[String]
        var k = 0
        while (k < word.length) {
          if (k < word.length - 1 && word(k) == a && word(k + 1) == b) {
            out += merged; k += 2
          } else { out += word(k); k += 1 }
        }
        word = out.result()
        done = word.length <= 1
      }
    }
    if (cache.size() >= cacheMax) cache.clear()
    cache.put(pretoken, word)
    word
  }

  /** Exact BPE token count. */
  def countTokens(text: String): Long = {
    val m = pretokenPattern.matcher(text)
    var n = 0L
    while (m.find()) n += bpe(m.group()).length
    n
  }

  /** The token strings (byte-alphabet) in order — spec/debug surface. */
  def tokens(text: String): Seq[String] = {
    val m = pretokenPattern.matcher(text)
    val out = Seq.newBuilder[String]
    while (m.find()) out ++= bpe(m.group())
    out.result()
  }

  /** Token-exact truncation: keeps exactly the first `maxTokens` tokens of
    * the text's tokenization. Whole kept pre-tokens are appended as the
    * ORIGINAL characters (the pre-tokenizer tiles the string, so their
    * concatenation is a char-exact prefix — no byte round-trip that could
    * rewrite unpaired surrogates); only the final, partially-kept
    * pre-token is decoded from its token bytes, with a cut inside a
    * multi-byte UTF-8 sequence dropping the dangling fragment (byte-level
    * tokens may split characters, as in tiktoken). If that decoded
    * fragment is not a char-prefix of its pre-token (possible only for
    * invalid UTF-16 input), the fragment is dropped entirely — the result
    * is ALWAYS a prefix of the input and below-cap inputs pass through
    * identically.
    */
  def truncate(text: String, maxTokens: Int): String = {
    if (maxTokens <= 0) return ""
    val m = pretokenPattern.matcher(text)
    val out = new java.lang.StringBuilder(math.min(text.length, 4096))
    var used = 0L
    while (m.find()) {
      val pt = m.group()
      val toks = bpe(pt)
      if (used + toks.length <= maxTokens) {
        out.append(pt)
        used += toks.length
        if (used == maxTokens) return out.toString
      } else {
        val keep = (maxTokens - used).toInt
        val bytes = new java.io.ByteArrayOutputStream(pt.length * 2)
        var i = 0
        while (i < keep) {
          val t = toks(i)
          var c = 0
          while (c < t.length) { bytes.write(byteDecoder(t.charAt(c))); c += 1 }
          i += 1
        }
        val dec = StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(CodingErrorAction.IGNORE)
          .onUnmappableCharacter(CodingErrorAction.IGNORE)
        val frag = dec.decode(java.nio.ByteBuffer.wrap(bytes.toByteArray)).toString
        if (pt.startsWith(frag)) out.append(frag)
        return out.toString
      }
    }
    out.toString // every pre-token kept: identity by construction
  }
}

object BpeTokenizer {

  /** The GPT-2 pre-tokenizer (public pattern): contractions, optionally
    * space-prefixed letter/digit/punctuation runs, then whitespace
    * (non-final whitespace keeps its last char for the next token via the
    * lookahead). BPE merges never cross pre-token boundaries.
    */
  private[functions] val pretokenPattern: Pattern = Pattern.compile(
    """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  /** GPT-2 bytes-to-unicode: printable latin bytes map to themselves, the
    * rest to 256+n — every byte gets a distinct printable char so merges
    * files stay text.
    */
  private[functions] val byteEncoder: Array[Char] = {
    val printable = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  private[functions] val byteDecoder: Map[Char, Byte] =
    byteEncoder.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** Parse the standard `merges.txt` format: one `left right` pair per
    * line in rank order; `#`-prefixed headers and blanks skipped.
    */
  def fromMergesLines(lines: Iterator[String]): BpeTokenizer = {
    val merges = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ")
        require(sp.length == 2, s"malformed merges line: '$l'")
        (sp(0), sp(1))
      }
      .toSeq
    new BpeTokenizer(merges)
  }

  def fromMergesFile(path: String): BpeTokenizer = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromMergesLines(src.getLines()) finally src.close()
  }

  /** Bundled demo vocabulary (common English merges) — spec backend and
    * working out-of-the-box default; production swaps in a model's real
    * merges via [[fromMergesFile]].
    */
  lazy val bundled: BpeTokenizer = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "bundled /graft/bpe_merges.txt missing")
    try fromMergesLines(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }
}
