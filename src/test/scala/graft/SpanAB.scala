package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch A/B: window-min≠max vs agg+join cross-doc flag for
  * substringSpans (dev-only).
  */
object SpanAB {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val L = Dedup.SpanLen

    def shingles: DataFrame = graft.Tables.documents(spark, d)
      .filter(length(col("text")) >= L)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(expr(
        s"transform(filter(sequence(0, length(text) - $L)," +
          s" p -> substring(text, p + 1, 1) = ' ')," +
          s" p -> struct(p AS start, substring(text, p + 1, $L) AS shingle))")).as("sh"))
      .select(col("doc_id"), col("sh.start").cast("bigint").as("start"),
        col("sh.shingle").as("shingle"))

    def viaWindow: DataFrame = {
      val ws = Window.partitionBy(col("shingle"))
      shingles.withColumn("cd",
          min(col("doc_id")).over(ws) =!= max(col("doc_id")).over(ws))
        .filter(col("cd"))
        .select(col("doc_id"), col("start"))
    }
    def viaAgg: DataFrame = {
      val sh = shingles
      val dup = sh.groupBy(col("shingle"))
        .agg(min(col("doc_id")).as("a"), max(col("doc_id")).as("b"))
        .filter(col("a") =!= col("b")).select(col("shingle"))
      sh.join(dup, Seq("shingle")).select(col("doc_id"), col("start"))
    }
    def time(name: String)(f: => DataFrame): Unit = {
      f.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"AB $name%-10s min ${ts.min}%.3f runs ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def shinglesFlat: DataFrame = graft.Tables.documents(spark, d)
      .filter(length(col("text")) >= L)
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, length(text) - $L)")).as("p"))
      .filter(expr("substring(text, p + 1, 1) = ' '"))
      .select(col("doc_id"), col("p").cast("bigint").as("start"),
        expr(s"substring(text, p + 1, $L)").as("shingle"))
    def viaWindowFlat: DataFrame = {
      val ws = Window.partitionBy(col("shingle"))
      shinglesFlat.withColumn("cd",
          min(col("doc_id")).over(ws) =!= max(col("doc_id")).over(ws))
        .filter(col("cd"))
        .select(col("doc_id"), col("start"))
    }
    def shinglesFlatW: DataFrame = graft.Tables.documents(spark, d)
      .filter(length(col("text")) >= L)
      .repartition(32, col("doc_id"))
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, length(text) - $L)")).as("p"))
      .filter(expr("substring(text, p + 1, 1) = ' '"))
      .select(col("doc_id"), col("p").cast("bigint").as("start"),
        expr(s"substring(text, p + 1, $L)").as("shingle"))
    def viaWindowFlatW: DataFrame = {
      val ws = Window.partitionBy(col("shingle"))
      shinglesFlatW.withColumn("cd",
          min(col("doc_id")).over(ws) =!= max(col("doc_id")).over(ws))
        .filter(col("cd"))
        .select(col("doc_id"), col("start"))
    }
    time("sh-hof")(shingles)
    time("sh-flat")(shinglesFlat)
    time("sh-flatW")(shinglesFlatW)
    time("win-flatW")(viaWindowFlatW)
    time("window")(viaWindow)
    time("win-flat")(viaWindowFlat)
    time("agg")(viaAgg)
    time("win-flat")(viaWindowFlat)
    time("window")(viaWindow)
    spark.stop()
  }
}
