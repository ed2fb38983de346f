package graft.corrupt

import scala.util.Random
import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Schema-corruption generators for robustness experiments — the
  * reference's corruption.py:5–35 (three regimes, applied at
  * semantic_annotation.py:173–187). Test-fixture infrastructure, not an
  * engine data path. All corruption is seeded per value (hash of the
  * input), so results are deterministic and distribution-independent.
  */
object Corruption {

  /** corrupt_1: positional rename — `attribute_{i}` (corruption.py:29). */
  def positionalRename(df: DataFrame): DataFrame =
    df.toDF(df.columns.indices.map(i => s"attribute_$i"): _*)

  private val keyboardNeighbors = Map(
    'a' -> "qs", 'b' -> "vn", 'c' -> "xv", 'd' -> "sf", 'e' -> "wr",
    'f' -> "dg", 'g' -> "fh", 'h' -> "gj", 'i' -> "uo", 'j' -> "hk",
    'k' -> "jl", 'l' -> "k", 'm' -> "n", 'n' -> "bm", 'o' -> "ip",
    'p' -> "o", 'q' -> "wa", 'r' -> "et", 's' -> "ad", 't' -> "ry",
    'u' -> "yi", 'v' -> "cb", 'w' -> "qe", 'x' -> "zc", 'y' -> "tu",
    'z' -> "x")

  /** Char-level noise (swap / delete / keyboard-neighbor substitute), each
    * name corrupted with probability p (reference p=0.65, corruption.py:31;
    * nlpaug augmenters approximated with the same operation classes).
    */
  def charNoise(name: String, p: Double = 0.65, seed: Int = 42): String = {
    val rnd = new Random(MurmurHash3.stringHash(name, seed))
    if (name.length < 2 || rnd.nextDouble() >= p) name
    else {
      val i = rnd.nextInt(name.length - 1)
      rnd.nextInt(3) match {
        case 0 => // swap adjacent
          val a = name.toCharArray
          val t = a(i); a(i) = a(i + 1); a(i + 1) = t
          new String(a)
        case 1 => // delete
          name.substring(0, i) + name.substring(i + 1)
        case _ => // keyboard substitute
          val c = Character.toLowerCase(name.charAt(i))
          val sub = keyboardNeighbors.get(c)
            .map(ns => ns(rnd.nextInt(ns.length))).getOrElse(c)
          name.substring(0, i) + sub + name.substring(i + 1)
      }
    }
  }

  /** corrupt_2: char-noise applied to every column name. */
  def charNoiseRename(df: DataFrame, p: Double = 0.65, seed: Int = 42): DataFrame =
    df.toDF(df.columns.map(c => charNoise(c, p, seed)): _*)

  /** The per-name operation of [[poolSubstitution]]: replaced (with prob
    * p) by a seeded pick from the pool of all lake column names.
    */
  def poolPick(name: String, pool: Seq[String], p: Double = 0.65,
      seed: Int = 42): String = {
    val rnd = new Random(MurmurHash3.stringHash(name, seed ^ 0x5bd1e995))
    if (pool.nonEmpty && rnd.nextDouble() < p) pool(rnd.nextInt(pool.size)) else name
  }

  /** corrupt_3: random substitution from a global name pool
    * (corruption.py:33–35).
    */
  def poolSubstitution(df: DataFrame, pool: Seq[String], p: Double = 0.65,
      seed: Int = 42): DataFrame =
    df.toDF(df.columns.map(poolPick(_, pool, p, seed)): _*)

  /** Seeded value-level corruption column (for data-noise experiments):
    * corrupts string values in-flight with the same char operations.
    */
  def charNoiseValues(c: org.apache.spark.sql.Column, p: Double = 0.65,
      seed: Int = 42): org.apache.spark.sql.Column =
    F.udf((s: String) => if (s == null) null else charNoise(s, p, seed)).apply(c)
}
