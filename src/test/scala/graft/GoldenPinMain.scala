package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.ResponseTimePipeline

/** One-off generator for MlSpec's golden-prediction snapshot: trains the
  * seeded pipeline on the spec's deterministic feature frame and prints
  * the exact predicted doubles for the five pinned probe rows. Run via
  * `Test/runMain graft.GoldenPinMain`; dev tool, never shipped.
  */
object GoldenPinMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val endpoints = Seq("users", "orders", "search")
    val rows = for (i <- 0 until 600) yield {
      val ep = endpoints(i % 3)
      val base = (i % 3 + 1) * 0.1
      val hour = i % 24
      val rt = base + hour * 0.001 + (i % 7) * 1e-4
      (ep, "GET", "IN", 512.0f, hour, 200, rt)
    }
    val feats = rows.toDF("endpoint", "request_method", "country",
      "request_length", "hour_of_day", "status_code", "request_time_seconds")
    val model = ResponseTimePipeline.train(feats).get
    val probe = feats.limit(5)
    val out = model.transform(probe)
      .select(col("endpoint"), col("hour_of_day"), col("predicted_time"))
      .collect()
    out.foreach { r =>
      println(f"GOLDEN ${r.getString(0)}%s h=${r.getInt(1)}%d -> ${r.getDouble(2)}%.17g")
    }
    spark.stop()
  }
}
