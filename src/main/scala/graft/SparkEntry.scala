package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's named-query surface (the analogue of the
  * reference's Superset datasets over the at-rest tables,
  * superset/setup_dashboards.py:52-59); `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible query. Non-SQL-expressible
  * operators (streaming, ML scoring, hash-based sketches) appear in
  * `queries` only → driver records a rows-only check.
  */
object SparkEntry {

  /** All operator registries, merged. Name collisions are a bug — each
    * registry owns a distinct prefix.
    */
  private def registries: Seq[Map[String, QueryDef]] = Seq(
    operators.Analytics.defs,
    operators.TextAnalysis.defs,
    operators.Dedup.defs,
    operators.Similarity.defs,
    operators.Multimodal.defs,
    operators.TypedSessions.defs,
    operators.TrainingPrep.defs,
    operators.BpeTrain.defs,
    operators.AnnMaintain.defs,
    operators.ScaleOps.defs,
    operators.Retrieval.defs,
    operators.CorpusAudit.defs,
    operators.Skew.defs,
    operators.Graph.defs,
    operators.UnigramLm.defs,
    operators.LshTuning.defs,
    ml.MlScore.defs,
    sources.CatalogTables.defs,
    sources.FileFormats.defs)

  private lazy val all: Map[String, QueryDef] = {
    val merged = registries.flatten.toMap
    val n = registries.map(_.size).sum
    require(merged.size == n, s"duplicate query names across registries ($n vs ${merged.size})")
    merged
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Analytics.hourlyTraffic(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, v) => k -> v.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }

  /** Queries timed by [[Bench]] (all of them unless flagged off). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    all.collect { case (k, v) if v.headline => k -> v.build }
}
