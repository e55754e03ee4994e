package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (TESTDATA.md): one parquet file per table under a
  * scale-factor dir. Parquet is self-describing, so no inference scan runs;
  * Catalyst pushes filters + column pruning into these scans. On a real
  * cluster these paths would be partitioned table roots (date-partitioned
  * for `events`) — the reader API is identical, and partition pruning
  * replaces the reference's Postgres btree indexes
  * (reference: postgres/init.sql:80-84).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Fixture timestamps are parquet TIMESTAMP(MICROS,
    // isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ by
    // default. The engine standardizes on ONE timestamp type,
    // TIMESTAMP_LTZ (session tz pinned UTC everywhere): unix_micros,
    // watermarks, and window() require it, and with a UTC session the
    // wall-clock values the DuckDB oracle sees are identical either
    // way. Disable NTZ inference at the single fixture entry point so
    // the choice cannot depend on table-read order.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.parquet` has shipped with `ts` in two physical layouts
    * across fixture generations: parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]) — and
    * plain TIMESTAMP(MICROS). Branch on the footer schema: a MICROS
    * column is a native TimestampType scan (filters push down
    * untouched); a NANOS column is read as a LONG (legacy conf) and
    * truncated to microseconds with integer DIV — identical to DuckDB's
    * nanos→micros truncation, so the oracle sees the same values, with
    * [[graft.plans.NanosPushdown]] restoring time-range pushdown
    * through the conversion.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Keep the nanos pushdown rule installed regardless of layout: it
    // only matches the MicrosToTimestamp(ts DIV 1000) pattern, so it is
    // a no-op on native-micros plans. Append-if-absent so
    // caller-installed rules survive.
    if (!s.experimental.extraOptimizations.contains(graft.plans.NanosPushdown))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.NanosPushdown
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000L")))
      case _ => raw // native TIMESTAMP(MICROS) fixture layout
    }
  }
  // r20: the shared tokenization ([[graft.operators.TextAnalysis.words]])
  // is now the registered graft_split_words codegen function, and every
  // text operator starts from this reader — registering here makes the
  // function available to ALL consumers without a per-builder ensure.
  def documents(s: SparkSession, d: String): DataFrame = {
    graft.functions.Registry.ensure(s)
    table(s, d, "documents")
  }
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Spread heavy PER-ROW scan work (JSON rendering, fused hashing,
    * shingle explodes) across the session's shuffle parallelism before
    * it runs. This exists because the fixture tables are one parquet
    * split, and because `repartition(key)` WITHOUT an explicit width is
    * silently defeated by AQE — it coalesces a few-MB shuffle to one
    * 64 MB-advisory partition and serializes exactly the work the
    * repartition was meant to spread (measured 3.4× on the r8 shingle
    * stage). Every scan-spread site must call THIS, never a bare
    * `repartition(col)`; at 100 TB the scan arrives already split and
    * the extra exchange is noise next to the map it parallelizes.
    */
  def scanSpread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, key)

  /** THE materialization barrier (VERDICT r14 item 3) — the one place
    * the engine cuts lineage and pins an intermediate frame, replacing
    * the ~20 raw `localCheckpoint(true)` calls that each site used to
    * own.
    *
    * Local mode (default): an eager `localCheckpoint` — blocks live on
    * executors, which on local[n] is the driver JVM; correct and the
    * fastest barrier there is. On a REAL cluster an executor loss (or
    * dynamic-allocation scale-in) makes a locally-checkpointed frame
    * unrecoverable mid-job, so a deployment sets
    * `graft.barrier.mode=reliable` (plus
    * `sparkContext.setCheckpointDir` to durable storage) and every
    * barrier becomes a RELIABLE eager checkpoint — same semantics,
    * fault-tolerant blocks — with no call-site changes. Sites whose
    * pinned frame must outlive the session entirely use
    * [[graft.Artifacts.writeOnce]] instead (the parquet pin).
    *
    * `bound` documents the INPUT-CARDINALITY BOUND that keeps the
    * pinned frame small (vocab-bound, batch-bound, k-bound, …): every
    * barrier must state why its materialization cannot grow with the
    * corpus — frames without such a bound have no business being
    * pinned and should stay lazy plans. The string is kept (not just a
    * comment) so misuse reads loud at the call site.
    *
    * `eager = false` is the lazy variant ([[graft.storage.LogStore]]'s
    * read-isolation cut: lineage truncation only, materialized by the
    * caller's next action).
    */
  def barrier(df: DataFrame, bound: String, eager: Boolean = true): DataFrame = {
    require(bound.nonEmpty, "state the input-cardinality bound")
    if (df.sparkSession.conf.getOption("graft.barrier.mode").contains("reliable"))
      df.checkpoint(eager)
    else df.localCheckpoint(eager)
  }

  /** Chainable form of [[barrier]] (`import graft.Tables.BarrierOps`). */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrier(bound: String, eager: Boolean = true): DataFrame =
      Tables.barrier(df, bound, eager)
  }
}

/** One engine query: a Spark DataFrame builder plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables. Oracle
  * conventions that keep the driver's hash-compare byte-stable:
  *   - every output deterministically ORDER BY'd in BOTH dialects;
  *   - every double aggregate wrapped in round(x, 4) (or coarser for large
  *     sums) in BOTH dialects, absorbing float summation-order differences;
  *   - DuckDB integer sums cast to BIGINT (DuckDB widens to HUGEINT, Spark
  *     keeps LONG);
  *   - column names aliased identically in both dialects.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = true)
