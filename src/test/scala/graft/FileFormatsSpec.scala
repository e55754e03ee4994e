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

  test("csv reader surfaces malformed fields as nulls, never dropping rows") {
    // external CSV drops are never clean; the failure mode that matters
    // at scale is SILENT row loss. PERMISSIVE (the default) must keep
    // every line, null the unparsable fields, and parse the rest.
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-badcsv")
    java.nio.file.Files.write(dir.resolve("part.csv"),
      java.util.Arrays.asList(
        "event_id,ts,user_id,event_type,value",
        "1,2024-01-01 00:00:00.000001,7,view,1.5",
        "not_a_long,2024-01-01 00:00:00.000002,8,click,2.5",
        "3,THIS IS NOT A TIME,9,purchase,3.5"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val rows = spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(dir.toString)
      .collect()
    assert(rows.length == 3, s"rows dropped: ${rows.toSeq}")
    val byType = rows.map(r => r.getString(3) -> r).toMap
    assert(!byType("view").isNullAt(0) && !byType("view").isNullAt(1))
    assert(byType("click").isNullAt(0), "bad long must null, not drop")
    assert(!byType("click").isNullAt(1) && byType("click").getLong(2) == 8L,
      "good fields of a partly-bad row must survive")
    assert(byType("purchase").isNullAt(1), "bad timestamp must null, not drop")
    assert(byType("purchase").getLong(0) == 3L)
  }

  test("csv round trip preserves every row and micros timestamp exactly") {
    FileFormats.csvRoundtrip(spark, sf).collect()   // writes the artifact
    // the artifact is the deterministic ~1% slice (same mod filter the
    // ORC oracle replicates) — compare against exactly that slice
    val orig = Tables.events(spark, sf)
      .filter(pmod(col("event_id"), lit(101)) === 7)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val back = spark.read
      .schema(orig.schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(FileFormats.CsvPath)
    // exact row-set identity, micros and doubles included: the diff is
    // empty both ways (exceptAll is multiset-aware)
    assert(orig.count() > 0, "slice must be non-empty or the trip checks nothing")
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
      "CSV round trip changed at least one row")
  }
}
