package graft.operators

import org.apache.spark.sql.functions._

/** Probe: candidate-pair reduction from the size-ratio prefilter
  * (VERDICT r14 item 2's "pair-count reduction logged") — counts the
  * dedup candidate edges and the cross-split decontamination candidates
  * before and after the `2·min ≥ max` cardinality cut at a given SF
  * dir. Usage: `Test/runMain graft.operators.RatioProbeMain <sfDir>`.
  */
object RatioProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.ensure(spark)

    val index = Dedup.minhashIndexOf(graft.Tables.documents(spark, dir))
    val cand = Dedup.candidateEdges(Dedup.minhashBanded(index)).cache()
    val all = cand.count()
    val kept = cand.filter(least(col("na"), col("nb")) * 2 >= greatest(col("na"), col("nb"))).count()
    println(f"DEDUP candidate pairs: $all%d -> $kept%d after size-ratio " +
      f"(${100.0 * (all - kept) / math.max(1, all)}%.1f%% pruned)")
    cand.unpersist()

    // decontaminate: cross-split candidates before/after the cut
    val isTest = graft.GoldenHash.isTestDoc(col("doc_id"))
    val banded = Dedup.minhashBanded(index).withColumn("is_t", isTest)
    val bucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("key"))
    val byId = bucket.orderBy(col("doc_id"))
    val testId = when(col("is_t"), col("doc_id"))
    val dc = banded
      .withColumn("prev_t", last(testId, ignoreNulls = true)
        .over(byId.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("next_t", first(testId, ignoreNulls = true)
        .over(byId.rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .withColumn("min_t", min(testId).over(bucket))
      .filter(!col("is_t"))
      .select(col("doc_id"), col("ng"),
        explode(array_distinct(array(col("prev_t"), col("next_t"), col("min_t"))))
          .as("test_id"))
      .filter(col("test_id").isNotNull)
      .distinct()
      .join(broadcast(index.filter(isTest)
        .select(col("doc_id").as("test_id"), size(col("grams")).as("tn"))), Seq("test_id"))
      .cache()
    val dAll = dc.count()
    val dKept = dc.filter(least(col("ng"), col("tn")) * 2 >= greatest(col("ng"), col("tn"))).count()
    println(f"DECONT candidate pairs: $dAll%d -> $dKept%d after size-ratio " +
      f"(${100.0 * (dAll - dKept) / math.max(1, dAll)}%.1f%% pruned)")
    spark.stop()
  }
}
