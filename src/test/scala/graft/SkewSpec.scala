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

  test("saltedTypeRollup equals the unsalted join and carries the salt in the plan") {
    val salted = Skew.saltedTypeRollup(spark, sf)
    val plain = {
      val dim = Skew.TypeWeights.toDF("event_type", "weight")
      Tables.events(spark, sf)
        .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
        .join(dim, "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("cents") * col("weight")).as("weighted_cents"),
          round(sum(col("cents") * col("weight")) / (count(lit(1)) * lit(100d)), 4)
            .as("avg_weighted_value"))
        .orderBy(col("event_type"))
    }
    assert(salted.collect().map(_.toSeq).toSeq == plain.collect().map(_.toSeq).toSeq)
    // the mitigation is real: the physical join key includes the salt
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt vanished from the physical plan:\n$plan")
  }
}
