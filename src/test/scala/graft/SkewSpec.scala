package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join and spreads the hot key") {
    // 10k rows of one hot key + a tail
    val large = spark.range(10000)
      .select(when(col("id") < 9000, lit("hot")).otherwise(concat(lit("k"), col("id")))
        .as("key"), col("id").as("event_id"))
    val small = Seq(("hot", 1), ("k9005", 2), ("absent", 3)).toDF("key", "payload")

    val plain = large.join(small, Seq("key"))
      .select("key", "event_id", "payload").collect().toSet
    val salted = Skew.saltedJoin(large, small, "key", salts = 8, saltBy = Seq("event_id"))
      .select("key", "event_id", "payload").collect().toSet
    assert(salted == plain)
    assert(plain.count(_.getString(0) == "hot") == 9000)

    // the hot key's rows actually spread across salt values
    val spread = large.withColumn("__salt", pmod(hash(col("event_id")), lit(8)))
      .filter(col("key") === "hot")
      .select(countDistinct(col("__salt"))).as[Long].collect().head
    assert(spread == 8)
  }
}
