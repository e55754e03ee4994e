package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev-only breakdown profiler for q_split_assign_delta2's steady-state
  * generation-2 probe (round-21 perf triage; test scope, never shipped).
  */
object Split2ProfileMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("full cold (gen-1 build + gen-2)")(Dedup.splitAssignDelta2(spark, d).count())
    t("full warm 1")(Dedup.splitAssignDelta2(spark, d).count())
    t("full warm 2")(Dedup.splitAssignDelta2(spark, d).count())
    val docs = graft.Tables.documents(spark, d)
    val b20 = graft.GoldenHash.bucket(col("doc_id"), 20)
    val idxB = Dedup.minhashIndexOf(
      docs.filter(b20 === 11).select(col("doc_id"), col("text")))
    val batchB = docs.filter(b20 === 11)
    t("bLabels (batch components)")(Dedup.nearDupLabels(
      batchB.select(col("doc_id").as("id")), idxB).count())
    t("bLabels again")(Dedup.nearDupLabels(
      batchB.select(col("doc_id").as("id")), idxB).count())
    t("matches (incremental probe)")(Dedup.incrementalNearDupsIdx(
      spark, idxB, "split2dx").count())
    t("matches again")(Dedup.incrementalNearDupsIdx(
      spark, idxB, "split2dx").count())
    t("atSplit table scan")(spark.table("split2dx_split").count())
    t("full warm 3")(Dedup.splitAssignDelta2(spark, d).count())
    spark.stop()
  }
}
