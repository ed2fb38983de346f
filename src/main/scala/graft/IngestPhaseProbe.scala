package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level wall-clock breakdown of the watermarked ingest queries
  * (q91 shape): index build, batch staging, the streaming ingest drive,
  * and the final state read are timed separately, so the "streaming
  * fixed overhead" verdict can be attributed to the phase that actually
  * owns the seconds instead of to the micro-batch machinery wholesale.
  */
object IngestPhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("GRAFT_PROBE_LIST_THRESH", "32"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("GRAFT_PROBE_CODEGEN", "true"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_PROBE_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // per-job wall time grouped by job description: which operator step
    // owns the seconds, not just the job count
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val byDesc = new java.util.concurrent.ConcurrentHashMap[String, (Integer, java.lang.Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("?")
          jobStart.put(js.jobId, (desc, System.nanoTime())); ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(je.jobId)).foreach { case (desc, t0) =>
            val dt = System.nanoTime() - t0
            byDesc.merge(desc, (1, dt),
              (a, b) => (a._1 + b._1, a._2 + b._2))
          }
          ()
        }
      })
    def dumpDescs(label: String): Unit = {
      import scala.jdk.CollectionConverters._
      Thread.sleep(500) // drain the async listener bus
      println(s"  JOBS $label:")
      byDesc.asScala.toSeq.sortBy(-_._2._2.longValue).foreach {
        case (desc, (n, ns)) =>
          println(f"    ${ns / 1e9}%6.2f s  n=$n%-3d $desc")
      }
      byDesc.clear()
    }

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val shapes = sys.env.getOrElse("GRAFT_PROBE_SHAPE", "q91,q98")
      .split(',').toSet

    // q98 shape: the full gated run PLUS the late-audit re-ingest loop
    // — phase ledger for the round-13 verdict's "new slowest query"
    // (13.0 s median). The re-stage leg (lateRows → stageBatch →
    // lexIngestOnce) is timed separately from the gated leg so the
    // staged-file round trip's machinery cost is attributable.
    if (shapes("q98")) for (round <- 1 to 3) {
      println(s"q98-shape round $round")
      val docs = sources.Lake.documents(spark, d)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val base = util.TempDirs.register(
        s"/tmp/graft_phaseprobe98_${ProcessHandle.current().pid()}_$round")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      timed("build")(text.Bm25Index.build(docs, "doc_id", "text", s"$base/index"))
      val t0 = 1700000000000L
      timed("stage")(SparkEntry.stageLateBatches(docs, base, t0))
      timed("gated-ingest")(streaming.Streams.lexIngestWatermarked(spark,
        s"$base/batches", SparkEntry.lateBatchSchema, s"$base/index",
        s"$base/out", "doc_id", "text", "ts", lateness = 100L, topK = 3))
      dumpDescs("gated-ingest")
      // a pristine copy of the post-gate index for the fused leg — the
      // staged-route leg below commits the late rows into the original,
      // after which a second re-ingest would no-op on the anti-join
      locally {
        import scala.sys.process._
        Seq("cp", "-r", s"$base/index", s"$base/index_fused").!!; ()
      }
      timed("reingest-staged") {
        val late = timed("  lateRows")(
          streaming.Streams.lateRows(spark, s"$base/out")
            .getOrElse(sys.error("probe: expected late rows")))
        timed("  restage")(streaming.Streams.stageBatch(
          late.select("doc_id", "ts", "text"),
          s"$base/rebatches", "late_replay.parquet", t0 + 180000))
        timed("  lexIngestOnce")(streaming.Streams.lexIngestOnce(spark,
          s"$base/rebatches", SparkEntry.lateBatchSchema, s"$base/index",
          s"$base/out2", "doc_id", "text", topK = 3))
      }
      dumpDescs("reingest-staged")
      timed("reingest-fused")(streaming.Streams.lexReingestLate(spark,
        s"$base/out", s"$base/index_fused", s"$base/out2f",
        "doc_id", "text", topK = 3))
      dumpDescs("reingest-fused")
      timed("read")(
        text.Bm25Index.readDoclens(spark, s"$base/index").count())
    }

    if (shapes("q91")) for (round <- 1 to 3) {
      println(s"q91-shape round $round")
      val docs = sources.Lake.documents(spark, d)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val base = util.TempDirs.register(
        s"/tmp/graft_phaseprobe_${ProcessHandle.current().pid()}_$round")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      timed("build")(text.Bm25Index.build(docs, "doc_id", "text", s"$base/index"))
      // the ONE q91-shape staging fixture — shared with q91/q92/q98 so
      // this probe profiles exactly the workload the bench gates
      timed("stage")(SparkEntry.stageLateBatches(docs, base))
      val schema = SparkEntry.lateBatchSchema
      // the batch work WITHOUT the streaming machinery, against a COPY
      // of the built index (so the real ingest below still sees a clean
      // index): read each staged file and drive lexIngestBatch directly
      // — the difference between this and the full drive is what the
      // stream source/checkpoint round-trips cost
      timed("batches-direct") {
        import scala.sys.process._
        Seq("cp", "-r", s"$base/index", s"$base/index_direct").!!
        Seq("batch_a.parquet", "batch_b.parquet", "batch_c.parquet")
          .zipWithIndex.foreach { case (f, i) =>
            val b = spark.read.schema(schema).parquet(s"$base/batches/$f")
            timed(s"  batch$i")(streaming.Streams.lexIngestBatch(spark,
              s"$base/index_direct", s"$base/out_direct", i.toLong, b,
              "doc_id", "text", "ts", lateness = 100L, topK = 3))
          }
      }
      dumpDescs("batches-direct")
      timed("ingest")(streaming.Streams.lexIngestWatermarked(spark,
        s"$base/batches", schema, s"$base/index", s"$base/out",
        "doc_id", "text", "ts", lateness = 100L, topK = 3))
      dumpDescs("ingest")
      timed("read") {
        val committed = text.Bm25Index.readDoclens(spark, s"$base/index")
          .select(col("id"), col("dl").cast("long").as("dl"),
            lit(false).as("late"))
        val lateRows = spark.read.parquet(s"$base/out/late")
          .select(col("doc_id").cast("long").as("id"), lit(-1L).as("dl"),
            lit(true).as("late"))
        committed.unionByName(lateRows).count()
      }
    }
    spark.stop()
  }
}
