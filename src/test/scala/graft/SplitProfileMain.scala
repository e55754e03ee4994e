package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}

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
    t("full cold")(Dedup.splitAssignDelta(spark, d).count())
    val isDelta = graft.GoldenHash.bucket(col("doc_id"), 20) === 7
    val batch = graft.Tables.documents(spark, d).filter(isDelta)
    val idx = t("batch idx")(
      Dedup.minhashIndexOf(batch.select(col("doc_id"), col("text"))))
    t("labels total")(Dedup.nearDupLabels(
      batch.select(col("doc_id").as("id")), idx).count())
    // components alone on a trivial planted edge set of the same size
    val verts = batch.select(col("doc_id").as("id"))
    val edges = batch.limit(50).select(col("doc_id").as("src"),
      (col("doc_id") + 0).as("dst"))
    t("components only")(Graph.components(verts, edges).count())
    t("components only 2")(Graph.components(verts, edges).count())
    t("full warm")(Dedup.splitAssignDelta(spark, d).count())
    spark.stop()
  }
}
