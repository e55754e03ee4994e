package graft

import org.apache.spark.sql.functions._
import graft.parse.LogParse
import graft.model.NginxLog

/** Parse-chain edge cases from FIXTURES.md §B (each cites the reference
  * behavior it pins).
  */
class LogParseSpec extends SparkSpec {
  import spark.implicits._

  private def fullRecord(overrides: (String, String)*): String = {
    val base = Map(
      "time_iso8601" -> "2025-07-25T10:15:30+00:00",
      "remote_addr" -> "203.0.113.7",
      "request" -> "GET /api/users/42 HTTP/1.1",
      "request_uri" -> "/api/users/42",
      "request_method" -> "GET",
      "status" -> "200",
      "request_time" -> "0.042",
      "request_length" -> "512",
      "http_user_agent" -> "Mozilla/5.0",
      "geoip2_country_code" -> "IN") ++ overrides
    base.map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
  }

  private def parse(lines: String*) =
    LogParse.ingestChain(lines.toDF("value"))

  test("valid record parses with derived columns") {
    val out = parse(fullRecord()).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[java.sql.Timestamp]("timestamp").toInstant.toString
      == "2025-07-25T10:15:30Z")
    assert(r.getAs[Double]("request_time_seconds") == 0.042)
    assert(r.getAs[Int]("status_code") == 200)
    assert(r.getAs[String]("endpoint") == "users")
  }

  test("malformed JSON is dropped (NULL-struct policy)") {
    assert(parse("not json at all {{{").count() == 0)
  }

  test("record missing a required key is dropped (producer validity gate)") {
    // missing request_time
    val noRt = """{"request": "GET / HTTP/1.1", "remote_addr": "1.2.3.4", "status": "200"}"""
    assert(parse(noRt).count() == 0)
  }

  test("promtail self-traffic and NULL user agent are both dropped (!= null semantics)") {
    val promtail = fullRecord("http_user_agent" -> NginxLog.monitoringAgent)
    val nullUa =
      """{"request": "GET / HTTP/1.1", "remote_addr": "1.2.3.4",
        | "status": "200", "request_time": "0.1"}""".stripMargin.replace("\n", "")
    assert(parse(promtail, nullUa, fullRecord()).count() == 1)
  }

  test("non-numeric casts yield NULL, not errors") {
    val bad = fullRecord("request_time" -> "abc", "status" -> "xyz")
    val r = parse(bad).select("request_time_seconds", "status_code").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("request_uri with <2 path segments yields empty endpoint") {
    val r = parse(fullRecord("request_uri" -> "/healthz"))
      .select("endpoint").as[String].collect().head
    assert(r == "")
  }
}
