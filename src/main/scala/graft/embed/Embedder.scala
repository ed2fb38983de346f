package graft.embed

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, functions => F}

/** Pluggable text → vector embedding (SURVEY.md §2.10).
  *
  * The reference calls external models (OpenAI `text-embedding-3-small`,
  * SemLink/join_discoverer.py:161–165; SentenceTransformer, DeepJoin/
  * train.py:49). External models are nondeterministic and unavailable
  * offline, so the engine isolates them behind this trait; all tests and
  * oracles run [[HashEmbedder]], which is fully deterministic.
  *
  * A production implementation would batch HTTP calls per partition via
  * `mapPartitions` (mirroring the reference's throttled per-column loop at
  * join_discoverer.py:244) — same surface, different backend.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]

  /** Codegen boundary: embedding is the one hot-path UDF; it produces the
    * vector column once, after which all distance math is built-in.
    */
  def embedColumn(c: Column): Column = {
    val self = this
    F.udf((s: String) => if (s == null) null else self.embed(s)).apply(c)
  }
}

/** Deterministic feature-hashing embedder: word unigrams + boundary-marked
  * character trigrams, signed-hash folded into `dim` buckets, L2-normalized.
  * Same text → same vector on every JVM (MurmurHash3 is stable), so kNN
  * results are reproducible offline — the property the engine's tests and
  * the DuckDB oracle rely on.
  */
final case class HashEmbedder(dim: Int = 64, seed: Int = 42) extends Embedder {

  private def addFeature(v: Array[Float], f: String): Unit = {
    val h = MurmurHash3.stringHash(f, seed)
    val idx = java.lang.Math.floorMod(h, dim)
    val sign = if ((h & 0x80000000) == 0) 1f else -1f
    v(idx) += sign
  }

  override def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val norm = text.trim.toLowerCase
    if (norm.nonEmpty) {
      val toks = norm.split("\\s+")
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        addFeature(v, t)
        val marked = "^" + t + "$"
        var j = 0
        while (j + 3 <= marked.length) {
          addFeature(v, marked.substring(j, j + 3))
          j += 1
        }
        i += 1
      }
    }
    var ss = 0.0
    var k = 0
    while (k < dim) { ss += v(k).toDouble * v(k); k += 1 }
    if (ss > 0) {
      val inv = (1.0 / math.sqrt(ss)).toFloat
      k = 0
      while (k < dim) { v(k) *= inv; k += 1 }
    }
    v
  }
}
