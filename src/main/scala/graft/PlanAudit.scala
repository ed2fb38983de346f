package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: per-query exchange/scan/window counts from the executed plan
  * (AQE current plan only) — the shuffle audit the scale posture demands.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, d)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      def c(s: String) = plan.linesIterator.count(_.contains(s))
      // codegen stages print as "*(n) Op" in executed-plan strings, not
      // as the literal WholeStageCodegen node name
      println(f"$q%-28s exch=${c("Exchange")}%2d bcast=${c("BroadcastExchange")}%2d " +
        f"scan=${c("FileScan")}%2d win=${c("Window")}%2d sort=${c("Sort ")}%2d " +
        f"wsc=${c("*(")}%2d")
    }
    spark.stop()
  }
}
