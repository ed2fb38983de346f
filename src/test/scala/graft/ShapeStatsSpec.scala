package graft

import org.apache.spark.sql.functions._

import graft.knn.ShapeStats

class ShapeStatsSpec extends SparkSpec {

  import spark.implicits._

  private def frame(vecs: Seq[Array[Float]]) =
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")

  test("relative contrast separates the two measured catalog shapes: " +
    "clustered well above the spread-rule threshold, uniform near 1") {
    val rnd = new scala.util.Random(42)
    val d = 64
    // clustered: 20 tight Gaussian clusters, the jittered-copy fixture
    // shape (MakeScale embMode=jitter) in miniature
    val centers = Array.fill(20)(Array.fill(d)(rnd.nextFloat() * 2 - 1))
    val clustered = frame((0 until 800).map { i =>
      val c = centers(i % 20)
      c.map(x => x + rnd.nextGaussian().toFloat * 0.02f)
    })
    // spread: uniform components over the same range — the
    // embMode=spread adversarial shape, where distance concentration
    // drives every pairwise distance toward the mean
    val spread = frame((0 until 800).map(_ =>
      Array.fill(d)(rnd.nextFloat() * 2 - 1)))

    val stClustered = ShapeStats.relativeContrastStats(clustered, "id", "vec")
    val stSpread = ShapeStats.relativeContrastStats(spread, "id", "vec")
    // the doc's operating rule: rc ≲ 2 → spread-shaped (raise the
    // base beam per the measured ladder); rc ≳ 3 → clustered defaults
    // apply. The two shapes must land on opposite sides of the rule's
    // thresholds, with margin between them — on BOTH statistics
    // (unimodal catalogs: median and quartile agree).
    assert(stClustered.median > 3.0,
      s"clustered catalog measured rc ${stClustered.median} — no contrast?")
    assert(stSpread.median < 2.0,
      s"uniform catalog measured rc ${stSpread.median} — concentration missing?")
    assert(stClustered.median > 3 * stSpread.median)
    assert(stClustered.q25 > 3.0 && stSpread.q25 < 2.0,
      s"quartiles must agree on unimodal shapes: ${stClustered.q25} / " +
        s"${stSpread.q25}")
    assert(stSpread.q25 <= stSpread.median &&
      stClustered.q25 <= stClustered.median)
    // relativeContrast is the stats' median, definitionally
    assert(ShapeStats.relativeContrast(spread, "id", "vec")
      == stSpread.median)
  }

  test("bimodal mixture: the median snaps to a mode while the lower " +
    "quartile sees the spread share — the gate's decision statistic") {
    val rnd = new scala.util.Random(3)
    val d = 64
    // 65% tight clusters / 35% uniform: majority clustered, so the
    // median reads the clustered mode — but a 35% spread share pays
    // the measured spread recall floors at the default beam, and the
    // quartile must catch it
    val centers = Array.fill(40)(Array.fill(d)(rnd.nextFloat() * 2 - 1))
    val vecs = (0 until 520).map { i =>
      val c = centers(i % 40)
      c.map(x => x + rnd.nextGaussian().toFloat * 0.01f)
    } ++ (0 until 280).map(_ => Array.fill(d)(rnd.nextFloat() * 2 - 1))
    val st = ShapeStats.relativeContrastStats(frame(vecs), "id", "vec")
    assert(st.median > 3.0,
      s"majority-clustered mixture: median ${st.median} should read the " +
        "clustered mode")
    assert(st.q25 < 2.0,
      s"35% spread share: q25 ${st.q25} must read the spread mode")
  }

  test("deterministic across runs and layouts; duplicate vectors cannot " +
    "NaN the median; tiny catalogs degrade to 1.0") {
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 300).map(_ => Array.fill(16)(rnd.nextFloat()))
    val df = frame(vecs)
    val a = ShapeStats.relativeContrast(df, "id", "vec")
    val b = ShapeStats.relativeContrast(df.repartition(7), "id", "vec")
    assert(a == b, "seeded sample must be layout-independent")

    // exact duplicates give a zero nearest-neighbor distance — the
    // per-query contrast clamps to the FINITE documented sentinel, so
    // an all-duplicates catalog reads as maximally clustered without
    // printing 1.8e308 into a committed shape artifact
    val dup = frame(Seq.fill(50)(Array.fill(8)(1.0f)))
    val rcDup = ShapeStats.relativeContrast(dup, "id", "vec")
    assert(!rcDup.isNaN && !rcDup.isInfinity)
    assert(rcDup == ShapeStats.DuplicateContrast,
      s"all-duplicates catalog must read as the sentinel, got $rcDup")
    assert(ShapeStats.DuplicateContrast == 1e6)

    assert(ShapeStats.relativeContrast(frame(Seq(
      Array(1f, 2f), Array(3f, 4f))), "id", "vec") == 1.0)
  }

  test("the reported statistic is the true median: even sample sizes " +
    "average the middle pair (the upper-middle pick alone biased the " +
    "statistic by half an order-statistic gap)") {
    // 4 vectors on a line with one tight pair: per-query rc values are
    // distinct and computable by hand, and m = 4 is even — the result
    // must be the mean of the 2nd and 3rd order statistics, which is
    // NOT any single per-query value
    // quarters only — exactly representable in binary floats, so the
    // hand arithmetic below is bit-reproducible
    val df = frame(Seq(
      Array(0.0f), Array(0.25f), Array(5.0f), Array(9.0f)))
    val rc = ShapeStats.relativeContrast(df, "id", "vec")
    // per-query (mean over the other 3) / (nn over the catalog):
    // q0: mean (0.25+5+9)/3 = 4.75      nn 0.25 -> 19.0
    // q1: mean (0.25+4.75+8.75)/3       nn 0.25 -> 18.333...
    // q2: mean (5+4.75+4)/3 = 4.5833    nn 4.0  -> 1.145833...
    // q3: mean (9+8.75+4)/3 = 7.25      nn 4.0  -> 1.8125
    // sorted -> median = (1.8125 + 18.333...)/2, not any single value
    val q1 = (0.25 + 4.75 + 8.75) / 3 / 0.25
    val q3 = (9.0 + 8.75 + 4.0) / 3 / 4.0
    assert(math.abs(rc - (q3 + q1) / 2) < 1e-9,
      s"expected the averaged middle pair, got $rc")
  }
}
