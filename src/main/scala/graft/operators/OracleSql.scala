package graft.operators

/** DuckDB oracle SQL for [[Analytics]] — each string is the ANSI/DuckDB
  * equivalent of the Spark builder with the SAME column aliases, the SAME
  * deterministic ORDER BY, and the SAME rounding of double aggregates
  * (see QueryDef scaladoc for the conventions). DuckDB-specific notes:
  * integer SUM widens to HUGEINT → cast back to BIGINT; row_number()
  * yields BIGINT → cast to INT; `->>` is DuckDB JSON extraction.
  */
object OracleSql {

  val q1LineitemAgg: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100e0 AS sum_qty,
      |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100e0 AS sum_base_price,
      |  sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000e0 AS sum_disc_price,
      |  sum(CAST(round(l_discount * 100) AS BIGINT)) / (count(*) * 100e0) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val hourlyTraffic: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS requests,
      |  sum(CAST(round(value * 100) AS BIGINT)) / (count(*) * 100e0) AS avg_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  val trafficStats: String =
    """SELECT user_id,
      |  count(*) AS request_count,
      |  sum(CAST(round(value * 100) AS BIGINT)) / (count(*) * 100e0) AS avg_request_time
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val histBaseline: String =
    """WITH hourly AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS request_count
      |  FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-23 00:00:00' AND ts < TIMESTAMP '2024-01-30 00:00:00'
      |  GROUP BY 1, 2)
      |SELECT user_id,
      |  round(avg(request_count), 4) AS avg_requests,
      |  round(stddev_samp(request_count), 4) AS stddev_requests
      |FROM hourly
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  private val zscoreCte: String =
    """WITH hist AS (
      |  SELECT user_id,
      |    avg(request_count) AS avg_requests,
      |    stddev_samp(request_count) AS stddev_requests
      |  FROM (
      |    SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS request_count
      |    FROM events
      |    WHERE ts >= TIMESTAMP '2024-01-23 00:00:00' AND ts < TIMESTAMP '2024-01-30 00:00:00'
      |    GROUP BY 1, 2)
      |  GROUP BY user_id),
      |cur AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS request_count
      |  FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT cur.user_id, cur.hour, cur.request_count,
      |    hist.avg_requests, hist.stddev_requests,
      |    CASE WHEN hist.stddev_requests IS NOT NULL AND hist.stddev_requests > 0
      |         THEN (cur.request_count - hist.avg_requests) / hist.stddev_requests
      |         ELSE 0.0 END AS z_score,
      |    (abs(CASE WHEN hist.stddev_requests IS NOT NULL AND hist.stddev_requests > 0
      |              THEN (cur.request_count - hist.avg_requests) / hist.stddev_requests
      |              ELSE 0.0 END) > 3
      |     OR (hist.avg_requests IS NULL AND cur.request_count > 100)) AS is_anomaly,
      |    CASE WHEN (CASE WHEN hist.stddev_requests IS NOT NULL AND hist.stddev_requests > 0
      |                    THEN (cur.request_count - hist.avg_requests) / hist.stddev_requests
      |                    ELSE 0.0 END) > 3 THEN 'Unusually high traffic'
      |         WHEN (CASE WHEN hist.stddev_requests IS NOT NULL AND hist.stddev_requests > 0
      |                    THEN (cur.request_count - hist.avg_requests) / hist.stddev_requests
      |                    ELSE 0.0 END) < -3 THEN 'Unusually low traffic'
      |         WHEN hist.avg_requests IS NULL AND cur.request_count > 100
      |              THEN 'New IP with high traffic'
      |         ELSE NULL END AS anomaly_reason
      |  FROM cur LEFT JOIN hist ON cur.user_id = hist.user_id)""".stripMargin

  val zscoreAnomaly: String =
    zscoreCte +
      """
        |SELECT user_id, hour, request_count,
        |  round(avg_requests, 4) AS avg_requests,
        |  round(stddev_requests, 4) AS stddev_requests,
        |  round(z_score, 4) AS z_score,
        |  is_anomaly, anomaly_reason
        |FROM scored
        |ORDER BY user_id, hour""".stripMargin

  val anomalousRows: String =
    zscoreCte +
      """
        |SELECT event_id, ts, user_id, event_type, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
        |  AND user_id IN (SELECT user_id FROM scored WHERE is_anomaly)
        |ORDER BY event_id""".stripMargin

  val anomalyEnriched: String =
    zscoreCte +
      """
        |SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value,
        |  round(s.z_score, 4) AS z_score, s.anomaly_reason
        |FROM events e
        |JOIN scored s
        |  ON e.user_id = s.user_id AND date_trunc('hour', e.ts) = s.hour
        |WHERE e.ts >= TIMESTAMP '2024-01-30 00:00:00' AND s.is_anomaly
        |ORDER BY e.event_id""".stripMargin

  val featureExtraction: String =
    """SELECT event_id,
      |  CASE WHEN event_type IS NULL OR event_type = '' THEN 'UNKNOWN'
      |       ELSE event_type END AS category,
      |  CAST(EXTRACT(HOUR FROM ts) AS INT) AS hour_of_day,
      |  CAST(props ->> 'k' AS BIGINT) AS payload_k,
      |  round(value, 4) AS label
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-23 00:00:00'
      |  AND value IS NOT NULL AND value > 0 AND event_type <> ''
      |ORDER BY event_id
      |LIMIT 100000""".stripMargin

  val topEventTypes: String =
    """SELECT event_type, count(*) AS cnt,
      |  sum(CAST(round(value * 100) AS BIGINT)) / 100e0 AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY cnt DESC, event_type
      |LIMIT 3""".stripMargin

  val timeRangeScan: String =
    """SELECT event_id, ts, user_id, value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
      |  AND event_type = 'error'
      |ORDER BY event_id""".stripMargin

  val jsonExtractAgg: String =
    """SELECT event_type,
      |  CAST(sum(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(CAST(props ->> 'k' AS BIGINT)) AS n_k,
      |  round(avg(CAST(props ->> 'k' AS BIGINT)), 4) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val valueClassBreakdown: String =
    """SELECT event_type,
      |  CASE WHEN value < 50 THEN 'low'
      |       WHEN value < 150 THEN 'mid'
      |       ELSE 'high' END AS value_class,
      |  count(*) AS cnt
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  val windowTopPerUser: String =
    """SELECT user_id, rn, event_id, event_type, value FROM (
      |  SELECT user_id, event_id, event_type, value,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id) AS INT) AS rn
      |  FROM events)
      |WHERE rn <= 2
      |ORDER BY user_id, rn""".stripMargin

  val sessionStats: String =
    """WITH lagged AS (
      |  SELECT user_id,
      |    epoch_us(ts) AS ts_us,
      |    epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS prev_us
      |  FROM events)
      |SELECT user_id,
      |  CAST(sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM lagged
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val trafficForecast: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type,
      |  hour + INTERVAL 1 HOUR AS forecast_timestamp,
      |  round(avg(cnt) OVER (PARTITION BY event_type ORDER BY hour
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS predicted_requests
      |FROM hourly
      |ORDER BY event_type, forecast_timestamp""".stripMargin

  val revenueByRegion: String =
    """SELECT r_name,
      |  sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000e0 AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  val customerRevenue: String =
    """SELECT c_mktsegment, n_name,
      |  count(DISTINCT o_orderkey) AS n_orders,
      |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100e0 AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  val intervalJoin: String =
    """SELECT a.user_id,
      |  count(*) AS n_close_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_id < b.event_id
      | AND b.ts >= a.ts
      | AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin

  /** [[Analytics.linearAttribution]] — same integer-cent largest-
    * remainder allocation (`//` == Spark DIV on the non-negative
    * operands; non-negativity is ENFORCED by the `value >= 0` filter
    * both dialects apply — refunds would make floor vs truncation
    * diverge).
    */
  val linearAttribution: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS p_id, ts AS p_ts,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' AND value >= 0),
      |c AS (
      |  SELECT user_id, event_id AS c_id, ts AS c_ts
      |  FROM events WHERE event_type = 'click'),
      |touched AS (
      |  SELECT p.user_id, p.p_id, p.cents, c.c_id, c.c_ts
      |  FROM p JOIN c USING (user_id)
      |  WHERE c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 7 DAY),
      |shares AS (
      |  SELECT user_id, p_id, c_id,
      |    cents // (count(*) OVER (PARTITION BY p_id))
      |    + CASE WHEN row_number() OVER (PARTITION BY p_id ORDER BY c_ts, c_id)
      |                <= cents % (count(*) OVER (PARTITION BY p_id))
      |           THEN 1 ELSE 0 END AS share
      |  FROM touched),
      |att AS (
      |  SELECT user_id, count(DISTINCT p_id) AS n_attributed,
      |    count(DISTINCT c_id) AS n_touches,
      |    CAST(sum(share) AS BIGINT) AS attributed_cents
      |  FROM shares GROUP BY user_id),
      |pu AS (
      |  SELECT user_id, count(*) AS n_purchases,
      |    CAST(sum(cents) AS BIGINT) AS total_cents
      |  FROM p GROUP BY user_id)
      |SELECT pu.user_id, pu.n_purchases,
      |  coalesce(att.n_attributed, 0) AS n_attributed,
      |  coalesce(att.n_touches, 0) AS n_touches,
      |  pu.total_cents,
      |  coalesce(att.attributed_cents, 0) AS attributed_cents,
      |  pu.total_cents - coalesce(att.attributed_cents, 0) AS unattributed_cents
      |FROM pu LEFT JOIN att USING (user_id)
      |ORDER BY pu.user_id""".stripMargin

  val rollupTraffic: String =
    """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |  count(*) AS n,
      |  sum(CAST(round(value * 100) AS BIGINT)) / (count(*) * 100e0) AS avg_value
      |FROM events
      |GROUP BY ROLLUP (event_type, CAST(date_trunc('day', ts) AS DATE))
      |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin

  // DuckDB GROUPING() is BIGINT, Spark's is tinyint → both cast INT
  val cubeTraffic: String =
    """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |  CAST(GROUPING(event_type) AS INT) AS g_type,
      |  CAST(GROUPING(CAST(date_trunc('day', ts) AS DATE)) AS INT) AS g_day,
      |  count(*) AS n,
      |  sum(CAST(round(value * 100) AS BIGINT)) / (count(*) * 100e0) AS avg_value
      |FROM events
      |GROUP BY CUBE (event_type, CAST(date_trunc('day', ts) AS DATE))
      |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin

  // conditional counts are the pivot's relational form; 0 (not NULL)
  // for absent cells on both sides
  val pivotDaily: String =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error
      |FROM events
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // each event belongs to exactly the two hour-aligned 2h windows that
  // contain it — enumerate both starts per event, then aggregate
  val hoppingTraffic: String =
    """WITH ex AS (
      |  SELECT unnest([date_trunc('hour', ts),
      |                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start
      |  FROM events)
      |SELECT win_start, win_start + INTERVAL 2 HOUR AS win_end,
      |  count(*) AS n_events
      |FROM ex
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  val shippingPriority: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) / 10000e0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Sessions as lag-gap islands — an independent formulation of
    * Spark's session_window semantics: a new session starts where the
    * gap to the previous event exceeds 5 minutes; window end = last
    * event + gap (the Spark definition).
    */
  val sessionWindow: String =
    """WITH lagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 300000000
      |           OR lag(ts) OVER w IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM lagged)
      |SELECT user_id,
      |  epoch_us(min(ts)) AS start_us,
      |  epoch_us(max(ts)) + 300000000 AS end_us,
      |  count(*) AS n_events
      |FROM sessions
      |GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin

  val gapFill: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT min(date_trunc('hour', ts)) AS h0, max(date_trunc('hour', ts)) AS h1
      |  FROM events),
      |types AS (SELECT DISTINCT event_type FROM events),
      |grid AS (
      |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      |  FROM types, bounds)
      |SELECT g.event_type, g.hour,
      |  CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
      |  h.n IS NULL AS filled
      |FROM grid g LEFT JOIN hourly h
      |  ON g.event_type = h.event_type AND g.hour = h.hour
      |ORDER BY g.event_type, g.hour""".stripMargin

  val movingAvg: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, day,
      |  cents / 100e0 AS daily_value,
      |  round(avg(cents) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100, 4) AS trailing7_avg
      |FROM daily
      |ORDER BY event_type, day""".stripMargin

  val madAnomaly: String =
    """WITH med AS (
      |  SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
      |  FROM events e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, med, round(quantile_cont(adev, 0.5), 4) AS mad
      |  FROM dev GROUP BY 1, 2)
      |SELECT d.event_type, d.med, m.mad,
      |  CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
      |  count(*) AS n
      |FROM dev d JOIN mad m ON d.event_type = m.event_type
      |GROUP BY 1, 2, 3
      |ORDER BY d.event_type""".stripMargin

  val userRetention: String =
    """WITH daily AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events)
      |SELECT a.day, count(*) AS retained_users
      |FROM daily a JOIN daily b
      |  ON a.user_id = b.user_id AND b.day = a.day + 1
      |GROUP BY a.day
      |ORDER BY a.day""".stripMargin

  val latencyPercentiles: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.95), 4) AS p95,
      |  round(quantile_cont(value, 0.99), 4) AS p99,
      |  count(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** [[Analytics.latencyPercentilesApproxCheck]]: per-group exact n
    * recomputed, the rank-error-band booleans pinned at TRUE.
    */
  val latencyPercentilesApproxCheck: String =
    """SELECT event_type, count(*) AS n,
      |  TRUE AS p50_in_band,
      |  TRUE AS p95_in_band,
      |  TRUE AS p99_in_band
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val setOps: String =
    """WITH high AS (SELECT DISTINCT user_id FROM events WHERE value >= 180),
      |err AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
      |both_ AS (SELECT user_id FROM high INTERSECT SELECT user_id FROM err),
      |only_hi AS (SELECT user_id FROM high EXCEPT SELECT user_id FROM err)
      |SELECT user_id, 'high_and_error' AS set_op FROM both_
      |UNION ALL
      |SELECT user_id, 'high_only' AS set_op FROM only_hi
      |ORDER BY set_op, user_id""".stripMargin

  val funnel: String =
    """WITH v AS (
      |  SELECT user_id, min(ts) AS view_ts
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS click_ts
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= v.view_ts GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS purchase_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts GROUP BY 1)
      |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
      |  CAST(CASE WHEN p.purchase_ts IS NOT NULL THEN 3
      |            WHEN c.click_ts IS NOT NULL THEN 2 ELSE 1 END AS INT) AS stage
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin

  /** Replays [[Analytics.logIngest]] downstream of the wire render:
    * `read_json`s the pinned JSON-lines artifact with every field typed
    * VARCHAR (the Kafka wire contract — strings on the wire, types
    * derived by the parse chain), then re-derives the required-key
    * validity gate, the monitoring-agent filter (SQL `<>` null
    * semantics, same as the engine's `=!=`), the try-cast typed
    * derivations, the endpoint regex, and the exact-cents rollup.
    * Constants (required keys, agent string, endpoint pattern) are
    * interpolated from [[graft.model.NginxLog]] so engine and oracle
    * cannot drift.
    */
  val logIngest: String = {
    val gate = graft.model.NginxLog.requiredKeys
      .map(k => s"$k IS NOT NULL").mkString(" AND ")
    s"""WITH wire AS (
       |  SELECT * FROM read_json('${Analytics.WireLogsPath}/*.txt',
       |    format = 'newline_delimited',
       |    columns = {'time_iso8601': 'VARCHAR', 'remote_addr': 'VARCHAR',
       |               'request': 'VARCHAR', 'request_uri': 'VARCHAR',
       |               'request_method': 'VARCHAR', 'status': 'VARCHAR',
       |               'request_time': 'VARCHAR', 'http_user_agent': 'VARCHAR',
       |               'request_length': 'VARCHAR'})),
       |parsed AS (
       |  SELECT TRY_CAST(status AS INT) AS status_code,
       |    TRY_CAST(request_time AS DOUBLE) AS request_time_seconds,
       |    regexp_extract(request_uri, '${graft.model.NginxLog.endpointPattern}', 1) AS endpoint
       |  FROM wire
       |  WHERE $gate
       |    AND http_user_agent <> '${graft.model.NginxLog.monitoringAgent}')
       |SELECT endpoint, status_code, count(*) AS n,
       |  round(sum(CAST(round(request_time_seconds * 100000) AS BIGINT)) / 100000e0, 5)
       |    AS total_time
       |FROM parsed
       |GROUP BY 1, 2
       |ORDER BY endpoint, status_code""".stripMargin
  }

  val statsProfile: String =
    """SELECT event_type,
      |  round(corr(value, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)), 4) AS corr_value_hour,
      |  round(covar_samp(value, CAST(EXTRACT(HOUR FROM ts) AS DOUBLE)), 4) AS covar_value_hour,
      |  round(stddev_samp(value), 4) AS stddev_value,
      |  count(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin
}
