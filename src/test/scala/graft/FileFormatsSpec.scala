package graft

import org.apache.spark.sql.functions._
import graft.sources.FileFormats

/** The CSV/ORC round trips' data fidelity is pinned end-to-end by the
  * DuckDB oracle gate; this spec pins the SCALE posture — the read-back
  * scans must behave like first-class columnar sources (pushdown +
  * pruning for ORC; schema-pinned parse for CSV), or a 100 TB location
  * in either format would read everything for every query.
  */
class FileFormatsSpec extends SparkSpec {

  test("orc read-back pushes filters and prunes columns at the scan") {
    FileFormats.orcRoundtrip(spark, sf).collect()   // writes the artifact
    val plan = spark.read.orc(FileFormats.OrcPath)
      .filter(col("event_type") === "view")
      .select("event_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,view)]"),
      s"ORC scan did not push the filter:\n$plan")
    assert(plan.contains("ReadSchema: struct<event_id:bigint,event_type:string>"),
      s"ORC scan did not prune to the 2 referenced columns:\n$plan")
  }

  test("csv round trip preserves every row and micros timestamp exactly") {
    FileFormats.csvRoundtrip(spark, sf).collect()   // writes the artifact
    val orig = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val back = spark.read
      .schema(orig.schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(FileFormats.CsvPath)
    // exact row-set identity, micros and doubles included: the diff is
    // empty both ways (exceptAll is multiset-aware)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
      "CSV round trip changed at least one row")
  }
}
