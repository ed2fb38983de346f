package graft.functions

import java.nio.charset.{CodingErrorAction, StandardCharsets}
import java.util.regex.Pattern

import scala.collection.immutable.ArraySeq

/** Byte-level BPE over a `.tiktoken` rank table — the vocabulary format
  * of OpenAI's public tiktoken library, the reference's actual tokenizer
  * family (`cl100k_base`, SemLink/join_discoverer.py:34–62: prompts are
  * capped at 2048/8191 cl100k tokens). Where [[BpeTokenizer]] consumes a
  * GPT-2 `merges.txt` (explicit merge PAIRS, rank = line order), a
  * `.tiktoken` export lists whole token byte-sequences with their ranks
  * (`base64(tokenBytes) rank` per line) — the ranks double as merge
  * priority: tokenizing a pre-token starts from single bytes and
  * repeatedly merges the adjacent pair whose concatenation has the
  * lowest rank in the table (leftmost on ties), until no adjacent pair
  * concatenates to an in-vocabulary sequence. Dropping in the published
  * `cl100k_base.tiktoken` file reproduces that model's token boundaries;
  * a bundled demo vocabulary in the same format
  * (`graft/bpe_cl100k_demo.tiktoken`) backs the specs offline.
  *
  * The default pre-tokenizer is the public cl100k pattern (contraction
  * suffixes case-insensitively, optionally punctuation-prefixed letter
  * runs, digit runs CAPPED AT 3, punctuation runs with trailing
  * newlines, newline runs, then whitespace) — selected per vocabulary
  * format by [[BpeEngine.fromVocabFile]], with the GPT-2 pattern staying
  * on `merges.txt` loads. Compiled with UNICODE_CHARACTER_CLASS so `\s`
  * matches Unicode whitespace like tiktoken's regex crate.
  *
  * Same determinism/scale posture as [[BpeTokenizer]]: per-pre-token
  * memo cache, the rank table rides the task binary (~1.7 MB for the
  * real cl100k export), pure JVM, no per-row allocation beyond the
  * pre-token scan.
  */
final class TiktokenBpe(
    ranks: Map[ArraySeq[Byte], Int],
    pretokenRegex: String) extends BpeEngine {

  require(ranks.nonEmpty, "TiktokenBpe: empty rank table")

  @transient private lazy val pattern =
    Pattern.compile(pretokenRegex, Pattern.UNICODE_CHARACTER_CLASS)

  /** Executor-local pre-token memo (bounded; cleared when full). */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Byte]]]()
  private val cacheMax = 65536

  /** tiktoken `byte_pair_merge`: merge the lowest-ranked adjacent pair
    * (leftmost on ties) until none concatenates into the vocabulary.
    * Returns the token byte-sequences in order.
    */
  private def pieces(pretoken: String): Array[Array[Byte]] = {
    val cached = cache.get(pretoken)
    if (cached != null) return cached
    val bytes = pretoken.getBytes(StandardCharsets.UTF_8)
    val out: Array[Array[Byte]] =
      if (bytes.length <= 1 || ranks.contains(ArraySeq.unsafeWrapArray(bytes)))
        Array(bytes) // whole pre-token is a single token (or single byte)
      else {
        var word: Vector[ArraySeq[Byte]] =
          bytes.iterator.map(b => ArraySeq(b)).toVector
        var done = false
        while (!done) {
          var best = -1
          var bestRank = Int.MaxValue
          var i = 0
          while (i < word.length - 1) {
            val r = ranks.getOrElse(word(i) ++ word(i + 1), Int.MaxValue)
            if (r < bestRank) { bestRank = r; best = i }
            i += 1
          }
          if (best < 0) done = true
          else {
            word = word.patch(best, Seq(word(best) ++ word(best + 1)), 2)
            done = word.length <= 1
          }
        }
        word.iterator.map(_.toArray).toArray
      }
    if (cache.size() >= cacheMax) cache.clear()
    cache.put(pretoken, out)
    out
  }

  def countTokens(text: String): Long = {
    val m = pattern.matcher(text)
    var n = 0L
    while (m.find()) n += pieces(m.group()).length
    n
  }

  /** The token byte-sequences in order — spec/debug surface. */
  def tokens(text: String): Seq[Array[Byte]] = {
    val m = pattern.matcher(text)
    val out = Seq.newBuilder[Array[Byte]]
    while (m.find()) out ++= pieces(m.group())
    out.result()
  }

  /** Token-exact truncation, same contract as [[BpeTokenizer.truncate]]:
    * whole kept pre-tokens are appended as the ORIGINAL characters; the
    * final partially-kept pre-token is decoded from its token bytes with
    * malformed tails dropped (byte-level tokens may split characters);
    * the result is ALWAYS a prefix of the input and below-cap inputs
    * pass through identically.
    */
  def truncate(text: String, maxTokens: Int): String = {
    if (maxTokens <= 0) return ""
    val m = pattern.matcher(text)
    val out = new java.lang.StringBuilder(math.min(text.length, 4096))
    var used = 0L
    while (m.find()) {
      val pt = m.group()
      val toks = pieces(pt)
      if (used + toks.length <= maxTokens) {
        out.append(pt)
        used += toks.length
        if (used == maxTokens) return out.toString
      } else {
        val keep = (maxTokens - used).toInt
        val bytes = new java.io.ByteArrayOutputStream(pt.length * 2)
        var i = 0
        while (i < keep) { bytes.write(toks(i)); i += 1 }
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

object TiktokenBpe {

  /** The public cl100k_base pre-tokenizer pattern (tiktoken
    * `cl100k_base.py`): case-insensitive contraction suffixes, letter
    * runs with one optional non-letter prefix, digit runs of AT MOST 3
    * (long numbers split into triples — the visible difference from the
    * GPT-2 pattern), space-prefixed punctuation runs swallowing trailing
    * newlines, newline runs, then whitespace with the last-char
    * lookahead.
    */
  val Cl100kPattern: String =
    """'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""

  /** Parse `.tiktoken` lines: `base64(tokenBytes) rank`, one per line,
    * `#`-prefixed headers and blanks skipped.
    */
  def fromTiktokenLines(lines: Iterator[String],
      pretokenRegex: String = Cl100kPattern): TiktokenBpe = {
    val dec = java.util.Base64.getDecoder
    val ranks = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.split(" ")
        require(sp.length == 2 && sp(1).forall(_.isDigit),
          s"malformed .tiktoken line: '$l'")
        ArraySeq.unsafeWrapArray(dec.decode(sp(0))) -> sp(1).toInt
      }
      .toMap
    new TiktokenBpe(ranks, pretokenRegex)
  }

  def fromTiktokenFile(path: String,
      pretokenRegex: String = Cl100kPattern): TiktokenBpe = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromTiktokenLines(src.getLines(), pretokenRegex) finally src.close()
  }

  /** Bundled demo vocabulary in the real `.tiktoken` format (all 256
    * single bytes + common English merges) — offline spec backend;
    * production drops in the published `cl100k_base.tiktoken` via
    * [[fromTiktokenFile]] / [[BpeEngine.fromVocabFile]].
    */
  lazy val bundledDemo: TiktokenBpe = {
    val in = getClass.getResourceAsStream("/graft/bpe_cl100k_demo.tiktoken")
    require(in != null, "bundled /graft/bpe_cl100k_demo.tiktoken missing")
    try fromTiktokenLines(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }
}
