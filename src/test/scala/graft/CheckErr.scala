package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: measure HLL/t-digest actual error at each SF (dev-only). */
object CheckErr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val r = Tables.events(spark, d).agg(
        approx_count_distinct(col("user_id")).as("au"),
        countDistinct(col("user_id")).as("nu"),
        approx_count_distinct(col("event_id")).as("ae"),
        countDistinct(col("event_id")).as("ne")).collect().head
      val (au, nu, ae, ne) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      println(f"CHECK $sf users $au/$nu (${math.abs(au - nu) * 100.0 / nu}%.2f%%) " +
        f"events $ae/$ne (${math.abs(ae - ne) * 100.0 / ne}%.2f%%)")
      val p = Tables.events(spark, d).groupBy(col("event_type")).agg(
        expr("approx_percentile(value, array(0.5,0.95,0.99), 10000)").as("pcts"),
        expr("percentile(value, 0.49)").as("lo50"),
        expr("percentile(value, 0.51)").as("hi50"),
        expr("percentile(value, 0.94)").as("lo95"),
        expr("percentile(value, 0.96)").as("hi95"),
        expr("percentile(value, 0.98)").as("lo99"),
        expr("max(value)").as("hi99"))
      val bad = p.filter(!(col("pcts")(0).between(col("lo50"), col("hi50")) &&
        col("pcts")(1).between(col("lo95"), col("hi95")) &&
        col("pcts")(2).between(col("lo99"), col("hi99")))).count()
      println(s"CHECK $sf percentile groups out of +-0.01 rank band: $bad")
    }
    spark.stop()
  }
}
