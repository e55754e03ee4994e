package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the minhash dedup path (dev-only; not a
  * spec). Run: sbt "Test/runMain graft.operators.ProfileMain".
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm at sf0.001 first (class-loading etc.)
    Dedup.minhashDedup(spark, "/root/testdata/sf0.001").count()

    time("full #1 (index+artifact)") { Dedup.minhashDedup(spark, d).count() }

    val index = time("index (cached)") { Dedup.minhashIndex(spark, d) }
    val banded = Dedup.minhashBanded(index)
    val cand = time("candidateEdges") {
      val c = Dedup.candidateEdges(banded); c.count(); c
    }
    val grams = index.select(col("doc_id"), col("grams"))
    val verified = time("verify") {
      val v = cand
        .join(grams.select(col("doc_id").as("doc_a"), col("grams").as("ga")), Seq("doc_a"))
        .join(grams.select(col("doc_id").as("doc_b"), col("grams").as("gb")), Seq("doc_b"))
        .filter(graft.functions.NgramJaccardFunctions.jaccardSorted(col("ga"), col("gb")) >= 0.5)
        .select(col("doc_a"), col("doc_b"))
      v.count(); v
    }
    val vCached = verified.localCheckpoint(true)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(e.jobId, e.time)
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(f"PROFILE-JOB ${e.jobId}%3d ${(e.time - starts.getOrDefault(e.jobId, e.time)) / 1000.0}%.3f s")
    }
    spark.sparkContext.addSparkListener(listener)
    time("connectedComponents (cached edges)") {
      Graph.connectedComponents(
        graft.Tables.documents(spark, d).select(col("doc_id").as("id")),
        vCached.select(col("doc_a").as("src"), col("doc_b").as("dst"))).count()
    }
    spark.sparkContext.removeSparkListener(listener)
    time("full #2 (warm)") { Dedup.minhashDedup(spark, d).count() }
    time("full #3 (warm)") { Dedup.minhashDedup(spark, d).count() }
    spark.stop()
  }
}
