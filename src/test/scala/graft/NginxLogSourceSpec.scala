package graft

import org.apache.spark.sql.functions._

class NginxLogSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-v2src").toString
    val lines = Seq(
      """{"remote_addr": "1.1.1.1", "request": "GET /a/b HTTP/1.1", "status": "200", "request_time": "0.05", "request_uri": "/a/b", "http_user_agent": "x"}""",
      """{"remote_addr": "2.2.2.2", "request": "GET /c/d HTTP/1.1", "status": "500", "request_time": "0.50", "request_uri": "/c/d", "http_user_agent": "y"}""",
      "not json at all",
      """{"remote_addr": "3.3.3.3", "request": "GET /e/f HTTP/1.1", "status": "200", "request_time": "0.01", "request_uri": "/e/f", "http_user_agent": "z"}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    d
  }

  private def src = spark.read.format("graft.sources.NginxLogSource")
    .load(dir)

  test("reads the 38-field schema, skipping malformed lines") {
    assert(src.schema.fieldNames.length == 38)
    assert(src.count() == 3)
  }

  test("column pruning reaches the reader (scan schema is the projection)") {
    val q = src.select("remote_addr", "status")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("remote_addr") && !scan.contains("http_user_agent"), scan)
    assert(q.as[(String, String)].collect().toSet ==
      Set(("1.1.1.1", "200"), ("2.2.2.2", "500"), ("3.3.3.3", "200")))
  }

  test("equality filters are pushed and applied inside the reader") {
    val q = src.filter(col("status") === "200").select("remote_addr")
    // the pushed filter is fully consumed by the source: no FilterExec
    // remains in the physical plan, the scan's description records the
    // pushed predicates, and `status` is even pruned out of the read
    val plan = q.queryExecution.executedPlan
    val residualFilters = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(residualFilters.isEmpty, plan.toString)
    assert(plan.toString.contains("EqualTo(status,200)"), plan.toString)
    assert(q.as[String].collect().toSet == Set("1.1.1.1", "3.3.3.3"))
  }

  test("one large file fans out to byte-range splits with an identical row set") {
    // 5000 variable-length lines in ONE file; 64 KiB splits cut at
    // arbitrary byte offsets, so nearly every boundary lands mid-line —
    // the split protocol must neither lose nor duplicate any record
    val d = java.nio.file.Files.createTempDirectory("graft-v2split").toString
    val lines = (0 until 5000).map { i =>
      val pad = "p" * (i % 97)
      s"""{"remote_addr": "10.0.${i / 256}.${i % 256}", "request_uri": "/r/$i$pad", "status": "${200 + i % 3}"}"""
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "big.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val split = spark.read.format("nginxlog") // short-name registration
      .option("splitSize", 64 * 1024)
      .load(d)
      .select("request_uri")
    assert(split.rdd.getNumPartitions > 1, s"expected >1 split partitions")
    val got = split.as[String].collect().sorted
    val whole = spark.read.format("nginxlog").load(d)
      .select("request_uri").as[String].collect().sorted
    assert(got.length == 5000 && got.sameElements(whole))
  }

  test("the parse chain composes on top of the V2 source") {
    val parsed = graft.parse.LogParse.dropAgents(
      graft.parse.LogParse.extractEndpoint(graft.parse.LogParse.derive(src)))
    val eps = parsed.select("endpoint").as[String].collect().toSet
    assert(eps == Set("b", "d", "f"))
  }
}
