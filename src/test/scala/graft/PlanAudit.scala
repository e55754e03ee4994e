package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (q <- args.toSeq) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()  // materialize (AQE finalizes the plan)
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan") || l.contains("Window") || l.contains("Aggregate"))
        .take(25).mkString("\n"))
    }
    spark.stop()
  }
}
