package graft

import org.apache.spark.sql.functions._

import graft.text.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("importanceWeights matches the hand-computed bucket model") {
    // unigrams, 1 hex char (B=16). md5 first chars: "a"→0, "b"→9, "c"→4
    // (0cc175…, 92eb5f…, 4a8a08…) — three distinct buckets.
    val raw = Seq((1L, "a a b"), (2L, "c")).toDF("id", "text")
    val target = Seq(Tuple1("a b")).toDF("text")
    val got = Dsir.importanceWeights(raw, "id", "text", target, "text",
        maxN = 1, hexChars = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

    // R=4 (a,a,b,c), T=2 (a,b), B=16, α=1:
    // lr_b = ln((t+1)(R+16) / ((r+1)(T+16)))
    val lrA = math.log(2.0 * 20.0 / (3.0 * 18.0)) // t=1, r=2
    val lrB = math.log(2.0 * 20.0 / (2.0 * 18.0)) // t=1, r=1
    val lrC = math.log(1.0 * 20.0 / (2.0 * 18.0)) // t=0, r=1
    assert(got(1L) == ((3L, round4(2 * lrA + lrB))))
    assert(got(2L) == ((1L, round4(lrC))))
  }

  test("blank documents are restored at weight 0; empty target is legal") {
    val raw = Seq((1L, "x y"), (2L, ""), (3L, "   "), (4L, null))
      .toDF("id", "text")
    val out = Dsir.importanceWeights(raw, "id", "text",
        spark.emptyDataset[String].toDF("text"), "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(2L) == ((0L, 0.0)) && out(3L) == ((0L, 0.0)) &&
      out(4L) == ((0L, 0.0)))
    // empty target: every bucket's t=0 — weights finite and negative
    // (raw mass exists, target mass is all smoothing)
    assert(out(1L)._1 == 3L) // unigrams x, y + bigram "x y"
    assert(!out(1L)._2.isNaN && out(1L)._2 < 0)
  }

  test("target-like documents outrank disjoint ones") {
    val raw = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zqv kjw pxm trn blg vfd hsk")).toDF("id", "text")
    val target = Seq(
      Tuple1("the quick brown fox is quick"),
      Tuple1("a lazy dog sleeps")).toDF("text")
    val w = Dsir.importanceWeights(raw, "id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(2L))
  }

  test("weights are invariant to input partitioning") {
    val docs = (1L to 40L).map(i => (i, s"tok${i % 7} tok${i % 3} common"))
    val target = Seq(Tuple1("tok1 common"), Tuple1("tok2 common"))
      .toDF("text")
    val a = Dsir.importanceWeights(docs.toDF("id", "text"), "id", "text",
      target, "text").collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val b = Dsir.importanceWeights(
        docs.toDF("id", "text").repartition(13), "id", "text",
        target, "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(a == b)
  }

  test("gumbelTopK draws k deterministic rows; seed changes the draw") {
    val w = (1L to 100L).map(i => (i, i / 100.0)).toDF("id", "weight")
    val d1 = Dsir.gumbelTopK(w, "id", "weight", k = 10)
      .collect().map(_.getLong(0)).toSeq
    val d2 = Dsir.gumbelTopK(w, "id", "weight", k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(d1 == d2 && d1.size == 10)
    assert(Dsir.gumbelTopK(w, "id", "weight", k = 10, seed = 7L)
      .collect().map(_.getLong(0)).toSeq != d1)
    // k beyond the input keeps everything, and the output drops the key
    val all = Dsir.gumbelTopK(w, "id", "weight", k = 500)
    assert(all.count() == 100 && all.columns.toSeq == Seq("id", "weight"))
    // higher weight dominates the noise scale here: the top draw should
    // be weight-biased, not uniform — check the mean selected id is high
    assert(d1.map(_.toDouble).sum / d1.size > 50.0)
  }
}
