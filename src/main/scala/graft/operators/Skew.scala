package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Skew mitigation utilities.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`, on by
  * default) covers sort-merge joins at runtime; explicit salting remains
  * the tool when one key dominates a shuffle-hash join or an
  * aggregation's final stage. Salting trades an N-fold replication of
  * the small side for an N-way split of the hot key's partition.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted N ways:
    * the large side gets a deterministic salt from its row content
    * (spread uniformly via a hash of stable columns), the small side is
    * replicated once per salt value. Result is exactly the plain inner
    * join, but the hot key's rows land in N partitions instead of one.
    *
    * `saltBy` must be columns of `large` that vary within a key group
    * (e.g. the event id) so the hash spreads; constant columns would
    * leave the skew in place.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, saltBy: Seq[String]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol: Column = pmod(hash(saltBy.map(col): _*), lit(salts))
    val saltedLarge = large.withColumn("__salt", saltCol)
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** The per-event-type weight dimension — a 5-row literal in both
    * engines (the BmQueries stance), the classic "tiny dim ⋈ huge
    * skewed fact" shape: 5 join keys means 5 hot partitions no matter
    * the cluster width unless the join is salted.
    */
  val TypeWeights: Seq[(String, Int)] =
    Seq(("view", 1), ("click", 5), ("purchase", 50), ("signup", 10), ("error", 2))

  val SaltWays = 8

  /** [[saltedJoin]] as an oracle-checked query: events ⋈ the weight dim
    * on the 5-value event_type key, salted [[SaltWays]] ways (salt from
    * event_id, which varies within every key group), then the weighted
    * per-type rollup. The salt is INTERNAL — the result is exactly the
    * plain inner join, which is what the DuckDB oracle runs (no salt
    * anywhere in it): the compare proves the mitigation is
    * result-invariant, and SkewSpec pins that the physical join key
    * actually carries the salt. Money in integer cents (the
    * exactAvg convention).
    */
  def saltedTypeRollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = TypeWeights.toDF("event_type", "weight")
    val large = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    saltedJoin(large, dim, "event_type", SaltWays, Seq("event_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents") * col("weight")).as("weighted_cents"),
        round(sum(col("cents") * col("weight")) / (count(lit(1)) * lit(100d)), 4)
          .as("avg_weighted_value"))
      .orderBy(col("event_type"))
  }

  lazy val defs: Map[String, QueryDef] = Map(
    "q_salted_join" -> QueryDef(saltedTypeRollup, Some(SkewOracles.saltedTypeRollup)))
}

/** DuckDB oracle for [[Skew]] — the PLAIN join (no salt): equality is
  * the proof the salting is result-invariant.
  */
object SkewOracles {

  val saltedTypeRollup: String = {
    val dim = Skew.TypeWeights
      .map { case (t, w) => s"('$t', $w)" }.mkString(", ")
    s"""WITH dim(event_type, weight) AS (VALUES $dim),
       |e AS (
       |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events)
       |SELECT e.event_type, count(*) AS n,
       |  CAST(sum(e.cents * d.weight) AS BIGINT) AS weighted_cents,
       |  round(CAST(sum(e.cents * d.weight) AS BIGINT) / (count(*) * 100e0), 4)
       |    AS avg_weighted_value
       |FROM e JOIN dim d USING (event_type)
       |GROUP BY e.event_type
       |ORDER BY e.event_type""".stripMargin
  }
}
