package graft

import org.apache.spark.sql.DataFrame

import graft.annotate.Canonicalize
import graft.corrupt.{Corruption, Robustness}

/** Closes the round-4 q43 blind spot: the survival aggregation (clean-
  * vocabulary-only mapping fold, coalesce fallback for unmapped corrupt
  * annotations, per-regime match counts) is recomputed INDEPENDENTLY in
  * plain Scala over a hand-built catalog and compared row-for-row against
  * [[Robustness.annotationSurvival]]'s distributed plan.
  */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  // two-table catalog exercising the interesting paths: a synonym pair
  // (price/cost share a synset → same canonical), a prefix-stripped
  // annotation (o_price → price), and names with no synonyms at all
  private lazy val tables: Seq[(String, DataFrame)] = Seq(
    "sales" -> Seq((1, 2, 3)).toDF("o_price", "o_status", "descr"),
    "refs" -> Seq((1, 2)).toDF("x_cost", "region"))

  /** Independent reimplementation of annotation + survival (string ops +
    * the spec-verified first-seen fold), no Spark involved.
    */
  private def expectedSurvival(
      cat: Seq[(String, DataFrame)], p: Double, seed: Int): Map[Long, (Long, Long)] = {
    def anno(n: String): String =
      n.toLowerCase.map(c => if (c == ' ' || c == '-') '_' else c)
        .replaceFirst("^[a-z]_", "")
    val pool = cat.flatMap(_._2.columns)
    val rows = cat.flatMap { case (tbl, df) =>
      df.columns.zipWithIndex.flatMap { case (c, i) => Seq(
        (tbl, c, 1, s"attribute_$i"),
        (tbl, c, 2, Corruption.charNoise(c, p, seed)),
        (tbl, c, 3, Corruption.poolPick(c, pool, 1.0, seed)))
      }
    }
    val terms = rows.filter(_._3 == 1).map { case (t, c, _, _) => (t, c) }
      .sorted.map { case (_, c) => anno(c) }
    val mapping = Canonicalize.foldCanonical(terms)
    def canon(term: String): String = mapping.getOrElse(term, term)
    rows.groupBy(_._3).map { case (regime, rs) =>
      val matches = rs.count { case (_, clean, _, corrupt) =>
        canon(anno(clean)) == canon(anno(corrupt))
      }
      regime.toLong -> (rs.size.toLong, matches.toLong)
    }
  }

  private def collectSurvival(p: Double): Map[Long, (Long, Long, Double)] =
    Robustness.annotationSurvival(spark, tables, p, seed = 42).collect()
      .map(r => r.getAs[Long]("regime") ->
        (r.getAs[Long]("n_cols"), r.getAs[Long]("n_match"),
          r.getAs[Double]("match_rate")))
      .toMap

  test("survival aggregation matches an independent recomputation") {
    val got = collectSurvival(0.65)
    val exp = expectedSurvival(tables, 0.65, 42)
    assert(got.keySet == Set(1L, 2L, 3L))
    exp.foreach { case (regime, (nCols, nMatch)) =>
      val (gCols, gMatch, gRate) = got(regime)
      assert(gCols == nCols, s"regime $regime n_cols")
      assert(gMatch == nMatch, s"regime $regime n_match")
      val expRate = BigDecimal(nMatch.toDouble / nCols)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gRate == expRate, s"regime $regime match_rate")
    }
  }

  test("regime 1 (positional rename) survives nothing: canonicals live in the clean vocabulary") {
    val (nCols, nMatch, _) = collectSurvival(0.65)(1L)
    assert(nCols == 5L && nMatch == 0L)
  }

  test("regime 2 at p=0 is the identity: every annotation survives") {
    val (nCols, nMatch, rate) = collectSurvival(0.0)(2L)
    assert(nCols == 5L && nMatch == nCols && rate == 1.0)
  }

  test("regime 3 substitutes unconditionally even when p=0 gates regime 2") {
    // reference corrupt_3 has no probability gate (corruption.py:35): the
    // p argument must not leak into regime 3 — its corrupted names are
    // always pool picks, independent of p
    val cat1 = Robustness.corruptedCatalog(tables, p = 0.0, seed = 42)
    val cat2 = Robustness.corruptedCatalog(tables, p = 0.65, seed = 42)
    val r3 = cat1.filter(_._3 == 3)
    assert(r3 == cat2.filter(_._3 == 3))
    val pool = tables.flatMap(_._2.columns).toSet
    assert(r3.forall { case (_, _, _, corrupted) => pool.contains(corrupted) })
  }

  test("synonym canonicalization credits survival across synset members") {
    // price ↔ cost share a synset: a catalog whose regime-"corruption"
    // maps o_price → x_cost must still count as surviving
    def anno(n: String) = n.replaceFirst("^[a-z]_", "")
    val mapping = Canonicalize.foldCanonical(Seq("price", "cost").map(identity))
    assert(mapping("cost") == mapping("price"),
      "bundled synonyms must group price/cost for this spec's premise")
    assert(anno("o_price") == "price" && anno("x_cost") == "cost")
  }
}
