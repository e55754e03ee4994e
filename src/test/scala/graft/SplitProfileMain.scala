package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only breakdown profiler for q_split_assign_delta (round-14 perf
  * triage; safe to keep — test scope, never shipped).
  */
object SplitProfileMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("full cold")(graft.operators.Dedup.splitAssignDelta(spark, d).count())
    val isDelta = graft.GoldenHash.bucket(col("doc_id"), 20) === 7
    val batch = graft.Tables.documents(spark, d).filter(isDelta)
    t("batch labels")(graft.operators.Dedup.nearDupLabels(
      batch.select(col("doc_id").as("id")),
      graft.operators.Dedup.minhashIndexOf(batch.select(col("doc_id"), col("text")))).count())
    t("batch labels 2")(graft.operators.Dedup.nearDupLabels(
      batch.select(col("doc_id").as("id")),
      graft.operators.Dedup.minhashIndexOf(batch.select(col("doc_id"), col("text")))).count())
    t("probe only")(graft.operators.Dedup.incrementalNearDups(
      spark, batch.select(col("doc_id"), col("text")), "deltadx").count())
    t("full warm")(graft.operators.Dedup.splitAssignDelta(spark, d).count())
    spark.stop()
  }
}
