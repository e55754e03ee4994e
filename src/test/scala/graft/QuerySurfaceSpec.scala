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

  test("approx percentiles stay within 5% of exact at every quantile") {
    // (At sf0.001 the sketch holds all samples, so approx is near-exact;
    // the per-column check still pins the p50/p95/p99 → column mapping.)
    def triple(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // sf0.01 (~2k rows/group): at sf0.001 the p99 tail has ~2 samples
    // and nearest-sample-vs-interpolation gaps reach 25% — not a sketch
    // defect, just sparsity. Approx returns a nearest sample (no
    // interpolation), so tails still get a looser bound than the median.
    val sfP = "/root/testdata/sf0.01"
    val exact = triple(operators.Analytics.latencyPercentiles(spark, sfP))
    val approx = triple(operators.Analytics.latencyPercentilesApprox(spark, sfP))
    val tol = Seq(0.05, 0.10, 0.10)
    for ((k, es) <- exact; ((e, a), t) <- es.zip(approx(k)).zip(tol))
      assert(math.abs(a - e) / e < t, s"$k exact=$es approx=${approx(k)}")
    // exact percentiles must be monotone across the quantiles
    for ((k, Seq(p50, p95, p99)) <- exact)
      assert(p50 <= p95 && p95 <= p99, s"$k not monotone: $p50 $p95 $p99")
  }

  test("query outputs are deterministic across runs") {
    // sketch-based queries are merge-order-dependent once groups exceed
    // the sketch threshold — exclude them rather than rely on small-SF luck
    val sketchy = Set("q_approx_distinct", "q_latency_percentiles_approx")
    for ((name, fn) <- SparkEntry.queries if !sketchy(name)) {
      val a = fn(spark, sf).collect().toSeq
      val b = fn(spark, sf).collect().toSeq
      assert(a == b, s"$name not deterministic")
    }
  }
}
