package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S5: JDBC source with query pushdown — the reference ships whole
  * aggregation SQL into Postgres via subquery-as-dbtable
  * (predictions/anomaly_detection.py:33-53,
  * predictions/response_time_prediction.py:68-91). The engine exposes
  * both shapes; its own pipelines re-host those aggregations natively
  * over parquet (Analytics.histBaseline / featureExtraction), so JDBC is
  * for interop parity, not the hot path.
  *
  * Scale notes: `partitionColumn`/bounds split the read across
  * executors; without them a JDBC read is a single-task bottleneck.
  */
object JdbcSource {

  /** Read a full table, optionally partitioned for parallel pull. */
  def table(
      spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withProps = props.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    val withPart = partitionColumn.fold(withProps) { case (c, lo, hi, n) =>
      withProps.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }
    withPart.load()
  }

  /** Ship a query to the database and read only its result (the
    * reference's subquery-as-dbtable pushdown, modern `query` option).
    */
  def query(spark: SparkSession, url: String, sql: String,
      props: Map[String, String] = Map.empty): DataFrame =
    props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("query", sql)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
}
