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

  test("z-order interleaving is correct and locality-preserving") {
    import graft.functions.ZOrderValue.interleave
    assert(interleave(0L, 0L) == 0L)
    assert(interleave(1L, 0L) == 1L)      // a → even bits
    assert(interleave(0L, 1L) == 2L)      // b → odd bits
    assert(interleave(3L, 3L) == 15L)     // 0b11,0b11 → 0b1111
    assert(interleave(0xffffffffL, 0L) == 0x5555555555555555L)
    // locality: z of (x, y) and (x, y+1) share high bits more often
    // than random pairs — weak sanity via prefix agreement on a sample
    val close = (0 until 64).count { i =>
      java.lang.Long.numberOfLeadingZeros(interleave(i, 10) ^ interleave(i, 11)) >= 56
    }
    assert(close > 48, s"$close")
  }

  test("z-order clustered layout reads fewer files for a key predicate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString + "/ev"
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select("event_id", "user_id", "event_type", "value")
    LogStore.writeClustered(ev, dir, "user_id", "event_type", files = 16)
    val q = LogStore.read(spark, dir).filter(col("user_id") === 7)
    val n = q.count()
    assert(n == ev.filter(col("user_id") === 7).count() && n > 0)
    // scan metric: clustered layout must touch a minority of the files
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead <= 4, s"filesRead=$filesRead of 16")
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
