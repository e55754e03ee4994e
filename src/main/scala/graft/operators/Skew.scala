package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
