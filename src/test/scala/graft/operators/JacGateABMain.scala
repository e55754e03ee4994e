package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GoldenHash, Tables}

/** Dev-only A/B: the r20 threshold-gated Jaccard vs the plain sorted
  * merge on the REAL incremental-probe pair set at an arbitrary SF dir
  * (round-21 sf1 triage; test scope, never shipped). Requires the
  * `deltadx` bucketed tables (run DeltaProbeMain first, same sfdir).
  */
object JacGateABMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/sf1-rehearsal")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.ensure(spark)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ab] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.Artifacts.writeOnce(spark, d, "delta_dedup_index") {
      Dedup.writeDedupIndex(
        Tables.documents(spark, d).filter(GoldenHash.bucket(col("doc_id"), 20) =!= 7),
        "deltadx")
    }
    val delta = Tables.documents(spark, d)
      .filter(GoldenHash.bucket(col("doc_id"), 20) === 7)
    val newIdx = Dedup.minhashIndexOf(delta.select(col("doc_id"), col("text")))
    // replicate probeCandidates (private): band-key hits pruned to the
    // per-residue-class minimums
    val K = Dedup.ProbeCandPerBucket
    val hits = Dedup.fusedBandKeys(newIdx)
      .join(spark.table("deltadx_bands")
        .select(col("bkey"), col("doc_id").as("idx_doc")), Seq("bkey"))
      .filter(col("doc_id") =!= col("idx_doc"))
    val cand = hits
      .groupBy(col("doc_id"), col("bkey"))
      .agg(
        min(when(pmod(col("idx_doc"), lit(K)) === 0, col("idx_doc"))).as("c0"),
        (1 until K).map(r =>
          min(when(pmod(col("idx_doc"), lit(K)) === r, col("idx_doc"))).as(s"c$r")): _*)
      .select(col("doc_id"), explode(array(
        (0 until K).map(r => col(s"c$r")): _*)).as("idx_doc"))
      .filter(col("idx_doc").isNotNull)
      .select(col("doc_id"), col("idx_doc")).distinct()
    println("candidate pairs = " + t("cand count")(cand.count()))
    def pairs = cand
      .join(newIdx.select(col("doc_id"), col("grams").as("gn")), Seq("doc_id"))
      .join(spark.table("deltadx_grams")
        .select(col("doc_id").as("idx_doc"), col("grams").as("gi")), Seq("idx_doc"))
      .filter(Dedup.sizeRatioOk(size(col("gn")), size(col("gi"))))
    // warm both paths once, then min-of-2 each
    def gateRun() = pairs
      .withColumn("j", graft.functions.NgramJaccardFunctions.jaccardGate(col("gn"), col("gi"), 0.5))
      .filter(col("j") >= 0.5).agg(count(lit(1)), round(sum(col("j")), 2)).collect()(0)
    def sortedRun() = pairs
      .withColumn("j", graft.functions.NgramJaccardFunctions.jaccardSorted(col("gn"), col("gi")))
      .filter(col("j") >= 0.5).agg(count(lit(1)), round(sum(col("j")), 2)).collect()(0)
    // also: pairs materialization cost alone (arrays attached, no verify)
    def attachRun() = pairs.agg(count(lit(1)), sum(size(col("gn")) + size(col("gi")))).collect()(0)
    println("attach only: " + t("attach 1")(attachRun()))
    println("attach only: " + t("attach 2")(attachRun()))
    println("gate: " + t("gate 1")(gateRun()))
    println("sorted: " + t("sorted 1")(sortedRun()))
    println("gate: " + t("gate 2")(gateRun()))
    println("sorted: " + t("sorted 2")(sortedRun()))
    spark.stop()
  }
}
// (appended probe pieces main)
object JacPiecesMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/sf1-rehearsal")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.ensure(spark)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pc] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.Artifacts.writeOnce(spark, d, "delta_dedup_index") {
      Dedup.writeDedupIndex(
        Tables.documents(spark, d).filter(GoldenHash.bucket(col("doc_id"), 20) =!= 7),
        "deltadx")
    }
    val delta = Tables.documents(spark, d)
      .filter(GoldenHash.bucket(col("doc_id"), 20) === 7)
    val newIdx = t("newIdx build (sigs barrier)")(
      Dedup.minhashIndexOf(delta.select(col("doc_id"), col("text"))))
    t("bands table full scan")(println("bands rows = " +
      spark.table("deltadx_bands").count()))
    val keys = Dedup.fusedBandKeys(newIdx)
    t("fusedBandKeys count")(println("probe keys = " + keys.count()))
    val hits = keys
      .join(spark.table("deltadx_bands")
        .select(col("bkey"), col("doc_id").as("idx_doc")), Seq("bkey"))
      .filter(col("doc_id") =!= col("idx_doc"))
    t("hits count (join output)")(println("hits = " + hits.count()))
    t("hits count again")(println("hits = " + hits.count()))
    val K = Dedup.ProbeCandPerBucket
    val agg = hits.groupBy(col("doc_id"), col("bkey"))
      .agg(
        min(when(pmod(col("idx_doc"), lit(K)) === 0, col("idx_doc"))).as("c0"),
        (1 until K).map(r =>
          min(when(pmod(col("idx_doc"), lit(K)) === r, col("idx_doc"))).as(s"c$r")): _*)
    t("agg count")(println("agg groups = " + agg.count()))
    t("grams table full scan")(println("grams rows = " +
      spark.table("deltadx_grams").count()))
    spark.stop()
  }
}
