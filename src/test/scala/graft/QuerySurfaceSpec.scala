package graft

/** Contract checks on the driver-facing query surface. */
class QuerySurfaceSpec extends SparkSpec {

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query runs non-empty at sf0.001") {
    // The anomaly-row extractions are legitimately empty at sf0.001
    // (no |z|>3 hour in 1k events; their DuckDB oracles agree) — they
    // are non-empty from sf0.01 up.
    val mayBeEmpty = Set("q_anomalous_rows", "q_anomaly_enriched")
    val empty = SparkEntry.queries.collect {
      case (name, fn) if !mayBeEmpty(name) && fn(spark, sf).isEmpty => name
    }
    assert(empty.isEmpty, s"empty results at sf0.001: $empty")
  }

  test("typed sessionization agrees with the window-function formulation") {
    import org.apache.spark.sql.functions._
    val fromWindows = operators.Analytics.sessionStats(spark, sf)
      .select("user_id", "n_sessions").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromTyped = operators.TypedSessions.sessionize(spark, sf)
      .groupBy(col("user_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromTyped == fromWindows)
  }

  test("query outputs are deterministic across runs") {
    for ((name, fn) <- SparkEntry.queries if name != "q_approx_distinct") {
      val a = fn(spark, sf).collect().toSeq
      val b = fn(spark, sf).collect().toSeq
      assert(a == b, s"$name not deterministic")
    }
  }
}
