package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}

/** Dev-only breakdown harness for the components auto-selection at the
  * sf1 rehearsal scale (VERDICT r11 #2): times edge derivation and each
  * CC plan separately so the probe/escalation overhead is visible.
  * Run: sbt "Test/runMain graft.CcProbeMain [sfDir]"
  */
object CcProbeMain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/sf1-rehearsal")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val edges = time("edges derive+pin") {
      Dedup.ngramJaccardEdges(spark, d)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .localCheckpoint(true)
    }
    println(s"[ccprobe] |E| = ${edges.count()}")
    val vertices = time("vertices pin") {
      Tables.documents(spark, d).select(col("doc_id").as("id")).localCheckpoint(true)
    }
    println(s"[ccprobe] |V| = ${vertices.count()}")

    time("auto components (probe 2)") {
      Graph.components(vertices, edges, probeRounds = 2).count()
    }
    time("auto components (probe 6)") {
      Graph.components(vertices, edges, probeRounds = 6).count()
    }
    time("pure large/small-star") {
      Graph.largeSmallStarComponents(vertices, edges).count()
    }
    time("pure propagation") {
      Graph.connectedComponents(vertices, edges).count()
    }
    spark.stop()
  }
}
