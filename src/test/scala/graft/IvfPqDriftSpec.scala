package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.knn.IvfPqDrift
import graft.sources.Lake

/** Floor for the IVF-PQ ADC drift mix — the spec twin of the ScaleProbe
  * `ivfpqdrift` mode, driving the SAME [[graft.knn.IvfPqDrift]] harness
  * so the probe's committed numbers and this gate cannot measure
  * different things. The membership oracles (q41/q52/q58/q90/q101) pin
  * WHAT the index holds; this pins how well ADC searches it as the data
  * drifts away from the build-time codebooks, and that the two recovery
  * stages actually recover.
  */
class IvfPqDriftSpec extends SparkSpec {

  private lazy val emb = Lake.embeddings(spark, sf0001)
    .select("vec_id", "embedding").cache()

  private def shifted(df: DataFrame, delta: Double): DataFrame =
    df.withColumn("embedding",
      transform(col("embedding"), x => (x + lit(delta)).cast("float")))

  test("IVF-PQ ADC recall under drifting appends: decay is bounded, " +
    "rebalance is no ADC recovery, rebuild recovers fully") {
    val dir = graft.util.TempDirs.register(
      java.nio.file.Files.createTempDirectory("ivfpq_drift").toString)
    val bucket = pmod(xxhash64(col("vec_id")), lit(10))
    val base = emb.filter(bucket < 8)
    // the ScaleProbe fixture: appended batches are component-shifted out
    // of the training distribution (±0.37 component range)
    val b1 = shifted(emb.filter(bucket === 8), 0.3)
    val b2 = shifted(emb.filter(bucket === 9), 0.6)
    val queries = base.filter(col("vec_id") < 30)
      .unionByName(b2.filter(pmod(col("vec_id"), lit(13)) === 0))

    val curve = IvfPqDrift.runMix(spark, dir, base, b1, b2, queries,
      "vec_id", "embedding", nList = 16, pqM = 8, nProbes = Seq(4, 16))
    val byStage = curve.toMap
    assert(curve.map(_._1) ==
      Seq("build", "append1", "append2", "rebalance", "rebuild"))

    // every stage stays above a sanity floor at the wide probe — ADC
    // with exact re-rank must never fall off a cliff even mid-drift
    curve.foreach { case (stage, r) =>
      assert(r(16) >= 0.5, s"recall@10 nProbe=16 after $stage: ${r(16)}")
      // widening the probe must never cost recall materially
      assert(r(16) >= r(4) - 0.02, s"p16 below p4 after $stage: $r")
    }
    // the rebuild-cadence claim: a full rebuild (fresh centroids AND
    // codebooks over everything) restores the wide probe to the
    // build-time level
    assert(byStage("rebuild")(16) >= 0.85,
      s"rebuild did not recover: ${byStage("rebuild")}")
    assert(byStage("rebuild")(16) >= byStage("append2")(16) - 0.02,
      s"rebuild below drifted trough: $byStage")
    // rebalance is NOT an ADC recovery — measured here: it retrains the
    // coarse centroids and re-codes every residual against them, but
    // KEEPS the build-time codebooks, and the new residual distribution
    // mismatches codebooks trained on the old one (this fixture measures
    // rebalance BELOW the drifted trough at the wide probe: 0.88 vs
    // 0.97). Rebalance answers list skew; the answer to codebook drift
    // is rebuild. Pin only the sanity floor here, and that rebuild beats
    // rebalance — the ordering that makes the cadence claim true.
    assert(byStage("rebuild")(16) >= byStage("rebalance")(16),
      s"rebuild not above rebalance: $byStage")
  }
}
