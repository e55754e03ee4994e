package graft.model

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The nginx access-log data model.
  *
  * 38 raw fields, ALL strings — schema-on-read with explicit post-parse
  * casts, exactly as the reference declares in all three jobs
  * (reference: ingestor/main.py:7-45, predictions/anomaly_detection.py:130-168,
  * predictions/response_time_prediction.py:22-60; mirrored as TEXT columns
  * in postgres/init.sql:2-46). The schema is declared explicitly — never
  * inferred — which is also the 100 TB-safe choice: no inference scan,
  * stable casts.
  */
object NginxLog {

  /** Field order follows the reference's StructType declaration. */
  val fieldNames: Seq[String] = Seq(
    "msec", "connection", "connection_requests", "pid", "request_id",
    "request_length", "remote_addr", "remote_user", "remote_port",
    "time_local", "time_iso8601", "request", "request_uri", "args",
    "status", "body_bytes_sent", "bytes_sent", "http_referer",
    "http_user_agent", "http_x_forwarded_for", "http_host", "server_name",
    "request_time", "upstream", "upstream_connect_time",
    "upstream_header_time", "upstream_response_time",
    "upstream_response_length", "upstream_cache_status", "ssl_protocol",
    "ssl_cipher", "scheme", "request_method", "server_protocol", "pipe",
    "gzip_ratio", "http_cf_ray", "geoip2_country_code")

  /** The raw 38-field all-string schema. */
  val schema: StructType =
    StructType(fieldNames.map(StructField(_, StringType, nullable = true)))

  /** Keys whose presence makes a JSON object a valid nginx log record
    * (reference: producer/main.py:68-70 — the producer forwards a parsed
    * dict iff it contains all four).
    */
  val requiredKeys: Seq[String] =
    Seq("request", "remote_addr", "status", "request_time")

  /** The monitoring agent whose self-traffic every job drops
    * (reference: ingestor/main.py:68).
    */
  val monitoringAgent = "promtail/2.2.1"

  /** Endpoint extraction pattern: second path segment of request_uri,
    * '' when absent (reference: ingestor/main.py:78-81).
    */
  val endpointPattern = "^/[^/]+/([^/]+)"
}
