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

    val rcClustered = ShapeStats.relativeContrast(clustered, "id", "vec")
    val rcSpread = ShapeStats.relativeContrast(spread, "id", "vec")
    // the doc's operating rule: rc ≲ 2 → spread-shaped (raise the
    // base beam per the measured ladder); rc ≳ 3 → clustered defaults
    // apply. The two shapes must land on opposite sides of the rule's
    // thresholds, with margin between them.
    assert(rcClustered > 3.0,
      s"clustered catalog measured rc $rcClustered — no contrast?")
    assert(rcSpread < 2.0,
      s"uniform catalog measured rc $rcSpread — concentration missing?")
    assert(rcClustered > 3 * rcSpread)
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
    // per-query contrast clamps instead of producing NaN/Infinity in
    // the median
    val dup = frame(Seq.fill(50)(Array.fill(8)(1.0f)))
    val rcDup = ShapeStats.relativeContrast(dup, "id", "vec")
    assert(!rcDup.isNaN && !rcDup.isInfinity)

    assert(ShapeStats.relativeContrast(frame(Seq(
      Array(1f, 2f), Array(3f, 4f))), "id", "vec") == 1.0)
  }
}
