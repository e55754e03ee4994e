package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GoldenHash, Tables}

/** Dev tool: stage-level timing of [[graft.operators.TrainingPrep.corpusPrepDelta]]
  * at an arbitrary SF dir (default the sf1 rehearsal) — finds which
  * admission stage dominates.
  *
  * Run: `sbt "Test/runMain graft.DeltaProbeMain /root/repo/sf1-rehearsal"`.
  */
object DeltaProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/sf1-rehearsal")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, d)
    val isDelta = GoldenHash.bucket(col("doc_id"), 20) === 7
    val delta = docs.filter(isDelta)
    val atRest = docs.filter(!isDelta)

    time("writeDedupIndex") {
      graft.Artifacts.writeOnce(spark, d, "delta_dedup_index") {
        Dedup.writeDedupIndex(atRest, "deltadx")
      }
    }
    time("ensureMinhashPinned") { Dedup.ensureMinhashPinned(spark, d) }

    val qualityOk = delta.join(
      TextAnalysis.textQualityOf(delta)
        .filter(col("quality") === "ok").select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    time("quality") { println("  qualityOk=" + qualityOk.count()) }

    val exactClean = Dedup.incrementalExactClean(spark, qualityOk, "deltadx")
    time("exact(digest-probe)") { println("  exactClean=" + exactClean.count()) }
    // the pre-r13 raw-text anti-join (reshuffles the at-rest TEXT column
    // per batch — VERDICT r12 finding 1), timed as the A/B record
    val exactOld = qualityOk
      .join(atRest.select(col("text")), Seq("text"), "left_anti")
    time("exact(text-antijoin,old)") { println("  exactClean=" + exactOld.count()) }

    val rejected = time("nearDupProbe") {
      val r = Dedup.incrementalNearDups(spark, exactClean, "deltadx")
        .select(col("doc_id")).cache()
      println("  rejected=" + r.count())
      r
    }
    val nearClean = exactClean.join(rejected, Seq("doc_id"), "left_anti")

    val benchGrams = ScaleOps.wordGramsOf(
      docs.filter(GoldenHash.isTestDoc(col("doc_id"))))
      .select(col("g")).distinct()
    val admitted = time("decontaminate") {
      val a = nearClean.join(
        ScaleOps.wordGramsOf(nearClean).join(broadcast(benchGrams), Seq("g"))
          .select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti").cache()
      println("  admitted=" + a.count())
      a
    }
    time("bpeTokens") {
      println("  out=" + BpeTrain.bpeTokensOf(spark, d, admitted).count())
    }
    // second pass: warm-path probe cost (index + artifacts amortized)
    time("WARM nearDupProbe") {
      println("  rejected=" +
        Dedup.incrementalNearDups(spark, exactClean, "deltadx").count())
    }
    spark.stop()
  }
}
