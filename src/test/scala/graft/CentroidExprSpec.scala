package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CentroidKernel, LshKernel}

import graft.functions.VectorExpressions
import graft.sources.Lake

class CentroidExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Lake.embeddings(spark, sf0001).limit(300).cache()

  private lazy val centroids: Array[Array[Float]] = emb.limit(7)
    .select(col("embedding").cast("array<float>"))
    .as[Array[Float]].collect()

  // driver-side oracle replicating the replaced UDF exactly:
  // sort all (dist, idx) pairs lexicographically, take n
  private def oracleNearest(v: Array[Float], n: Int): Seq[Int] =
    centroids.indices.map { ci =>
      val c = centroids(ci)
      var d = 0.0
      var i = 0
      val m = math.min(c.length, v.length)
      while (i < m) { val x = v(i) - c(i); d += x * x; i += 1 }
      (d, ci)
    }.sortBy(identity).take(n).map(_._2)

  test("nearest_centroid / nearest_centroids match the sort-all oracle") {
    val kernel = new CentroidKernel(spark.sparkContext.broadcast(centroids))
    val got = emb.select(
      col("vec_id"),
      VectorExpressions.nearestCentroid(col("embedding"), kernel).as("one"),
      VectorExpressions.nearestCentroids(col("embedding"), kernel, 3).as("top3"),
      col("embedding").cast("array<float>").as("v"))
      .as[(Long, Int, Seq[Int], Array[Float])].collect()
    got.foreach { case (id, one, top3, v) =>
      val expect = oracleNearest(v, 3)
      assert(one == expect.head, s"vec $id: one=$one expected ${expect.head}")
      assert(top3 == expect, s"vec $id: top3=$top3 expected $expect")
    }
  }

  test("nearest_centroids clamps n beyond the codebook and keeps order") {
    val kernel = new CentroidKernel(spark.sparkContext.broadcast(centroids))
    val all = emb.limit(5)
      .select(VectorExpressions.nearestCentroids(col("embedding"), kernel, 99))
      .as[Seq[Int]].collect()
    all.foreach { got =>
      assert(got.size == centroids.length)
      assert(got.toSet == centroids.indices.toSet)
    }
  }

  test("non-positive nProbe fails loudly at the public APIs; the kernel " +
    "itself returns an empty probe list") {
    import spark.implicits._
    val vecs = (1 to 20)
      .map(i => (i.toLong, Array.tabulate(4)(j => (i * 3 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.knn.ApproxKnn.ivfKnn(vecs, vecs, "vec_id", "embedding",
        k = 3, nProbe = 0)
    }
    assert(e.getMessage.contains("nProbe"))
    // defense-in-depth behind the requires: n <= 0 reaching the kernel
    // used to evaluate ds(-1) and die with AIOOBE inside generated code
    val kernel = new org.apache.spark.sql.graft.CentroidKernel(
      spark.sparkContext.broadcast(Array(Array(0f, 0f), Array(1f, 1f))))
    val got = kernel.nearestN(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(0.5f, 0.5f)), 0)
    assert(got.numElements() == 0)
  }

  test("nearest_centroid stays inside whole-stage codegen over a real scan") {
    val kernel = new CentroidKernel(spark.sparkContext.broadcast(centroids))
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(VectorExpressions.nearestCentroid(col("embedding"), kernel).as("cid"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.contains("nearest_centroid") && l.contains("*(")),
      s"nearest_centroid fell out of the codegen span:\n$plan")
  }

  test("lsh_buckets matches a driver-side signature oracle (probe and plain)") {
    val tables = 3; val bits = 5; val dim = 8
    val rnd = new scala.util.Random(42)
    val planes = Array.fill(tables, bits, dim)(rnd.nextGaussian().toFloat)
    val kernel = new LshKernel(planes)

    def oracle(v: Array[Float], probe: Boolean): Seq[Long] =
      (0 until tables).flatMap { t =>
        var sig = 0L
        (0 until bits).foreach { b =>
          var dot = 0.0
          var i = 0
          val m = math.min(planes(t)(b).length, v.length)
          while (i < m) { dot += planes(t)(b)(i) * v(i); i += 1 }
          if (dot >= 0) sig |= (1L << b)
        }
        val base = t.toLong << 48
        if (probe) (base | sig) +: (0 until bits).map(fb => base | (sig ^ (1L << fb)))
        else Seq(base | sig)
      }

    val vecs = Seq.fill(20)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = df.select(col("id"),
      VectorExpressions.lshBuckets(col("v"), kernel, probe = false).as("plain"),
      VectorExpressions.lshBuckets(col("v"), kernel, probe = true).as("probed"),
      col("v")).as[(Long, Seq[Long], Seq[Long], Array[Float])].collect()
    got.foreach { case (id, plain, probed, v) =>
      assert(plain == oracle(v, probe = false), s"vec $id plain mismatch")
      assert(probed == oracle(v, probe = true), s"vec $id probed mismatch")
      assert(probed.size == tables * (bits + 1))
    }
  }

  test("kernels propagate null inputs as null") {
    val kernel = new CentroidKernel(spark.sparkContext.broadcast(centroids))
    val df = Seq((1, null: Seq[Float])).toDF("id", "v")
      .select(VectorExpressions.nearestCentroid(col("v")  , kernel).as("a"),
        VectorExpressions.nearestCentroids(col("v"), kernel, 2).as("b"))
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
