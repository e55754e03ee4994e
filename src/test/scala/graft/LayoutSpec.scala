package graft

import org.apache.spark.sql.functions._
import graft.storage.LogStore

/** Physical-layout behavior: partition pruning on the date layout and
  * shuffle-free joins on co-bucketed tables — the plan-level properties
  * the 100 TB design rests on.
  */
class LayoutSpec extends SparkSpec {

  test("date-partitioned store prunes partitions on a date predicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString + "/logs"
    val df = Tables.events(spark, sf).withColumnRenamed("ts", "timestamp")
    LogStore.writePartitioned(df, dir)

    val q = LogStore.read(spark, dir)
      .filter(col("event_date") === "2024-01-15")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-15"),
      scan.linesIterator.take(5).mkString("\n"))
    // pruning is dynamic (inputFiles lists the unpruned table) — assert
    // the predicate is a PartitionFilter (above) and semantics hold
    val n = q.count()
    val all = LogStore.read(spark, dir).count()
    assert(n > 0 && n < all, s"$n vs $all")
  }

  test("partition compaction merges micro-batch files, preserving rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/logs"
    val df = Tables.events(spark, sf).withColumnRenamed("ts", "timestamp")
      .filter(col("timestamp") >= "2024-01-15 00:00:00" &&
        col("timestamp") < "2024-01-16 00:00:00")
    // simulate 5 micro-batch appends → ≥5 files in the partition
    (1 to 5).foreach(_ => LogStore.writePartitioned(df, dir))
    def partFiles() = new java.io.File(s"$dir/event_date=2024-01-15")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = partFiles()
    val rowsBefore = LogStore.read(spark, dir).count()
    assert(before >= 5)
    LogStore.compactPartition(spark, dir, "2024-01-15")
    assert(partFiles() == 1)
    assert(LogStore.read(spark, dir).count() == rowsBefore)
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val ev = Tables.events(spark, sf)
    LogStore.writeBucketed(ev.select("event_id", "user_id", "value"), "ev_a", "user_id")
    LogStore.writeBucketed(
      ev.groupBy("user_id").agg(count(lit(1)).as("cnt")), "ev_b", "user_id")
    // force a non-broadcast join so the bucketed layout (not broadcast)
    // is what avoids the exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_a").join(spark.table("ev_b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        plan.linesIterator.take(25).mkString("\n"))
      assert(joined.count() == ev.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
