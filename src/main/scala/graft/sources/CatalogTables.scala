package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryDef

/** Persistent-catalog parity for the reference's Hive external table.
  *
  * The reference documents its at-rest surface as
  * `CREATE EXTERNAL TABLE … STORED AS PARQUET LOCATION …`
  * (reference README.md:7-11) — a table a user points at an EXISTING
  * parquet directory and then queries by name. The Spark-native
  * equivalent is a datasource table:
  * `CREATE TABLE … USING PARQUET LOCATION '…'` — unmanaged (EXTERNAL
  * in catalog terms: DROP TABLE removes metadata, never data files),
  * schema inferred once from the parquet footers and pinned in the
  * catalog, queryable via `spark.table`/SQL by every later reader.
  * Against a Hive metastore the identical DDL persists across
  * sessions; this sandbox runs the in-memory catalog, so persistence
  * here is session-scoped while the DDL and the files-on-disk
  * contract stay exactly what a metastore deployment would use.
  *
  * Scale posture: the catalog stores METADATA only — the scan behind
  * `spark.table` is the same pruned/pushed-down parquet scan as a
  * direct `spark.read.parquet` (LayoutSpec asserts file-set identity),
  * so a 100 TB location costs whatever the pruned query costs, and the
  * catalog adds planned-statistics options (ANALYZE TABLE) on top.
  */
object CatalogTables {

  /** Idempotently register `<dir>/<table>.parquet` as an external
    * datasource table; returns the catalog name. One name per location
    * (a session may hold fixture dirs at several scale factors).
    */
  def ensureExternalTable(s: SparkSession, d: String, table: String): String = {
    val loc = s"$d/$table.parquet"
    val name = s"graft_ext_${table}_${(loc.hashCode.toLong & 0xffffffffL).toHexString}"
    if (!s.catalog.tableExists(name)) {
      s.sql(s"CREATE TABLE $name USING PARQUET LOCATION '$loc'")
    }
    name
  }

  /** Shared query body — the catalog path and the DuckDB oracle run the
    * same SQL modulo the table name (exact-cents money convention).
    */
  private def scanSql(table: String): String =
    s"""SELECT o_orderpriority, count(*) AS n_orders,
       |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100e0 AS total_price
       |FROM $table
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** Orders rollup read THROUGH the catalog (`spark.table` resolution),
    * not a direct path read — S6 parity for the reference's external
    * table + dashboard query path.
    */
  def catalogScan(s: SparkSession, d: String): DataFrame =
    s.sql(scanSql(ensureExternalTable(s, d, "orders")))

  // lazy: oracle objects reference operator constants (e.g. DedupOracles
  // .spanCtes -> Dedup.SpanLen), so an eager defs -- which reads the oracle
  // object back -- would deadlock-null mid-initialization when a composed
  // oracle (TrainingOracles.corpusPrep4) initializes the oracle object first
  lazy val defs: Map[String, QueryDef] = Map(
    "q_catalog_scan" -> QueryDef(catalogScan, Some(scanSql("orders"))))
}
