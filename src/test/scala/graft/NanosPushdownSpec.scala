package graft

import org.apache.spark.sql.functions._

/** Boundary exactness of the nanos→micros comparison rewrite
  * (graft.plans.NanosPushdown): with the rule active, every comparison
  * op must keep/drop rows exactly as the unrewritten expression does,
  * including sub-microsecond nanos that truncate onto the boundary.
  */
class NanosPushdownSpec extends SparkSpec {
  import spark.implicits._

  test("all comparison ops agree with naive evaluation on boundary nanos") {
    spark.experimental.extraOptimizations = Seq(graft.plans.NanosPushdown)
    val boundaryMicros = 1706572800000000L // 2024-01-30 00:00:00 UTC in micros
    val nanos = Seq(-1L, 0L, 1L, 999L, 1000L, 1001L, -1000L, 500000L)
      .map(boundaryMicros * 1000L + _)
    val df = nanos.toDF("raw")
      .withColumn("ts", timestamp_micros(expr("raw DIV 1000L")))
    val lit30 = lit("2024-01-30 00:00:00").cast("timestamp")

    // expected: micros truncation then comparison on micros
    def expectMicros(p: Long => Boolean): Set[Long] =
      nanos.filter(n => p(Math.floorDiv(n, 1000L))).toSet

    val cases: Seq[(String, org.apache.spark.sql.Column, Long => Boolean)] = Seq(
      ("geq", col("ts") >= lit30, _ >= boundaryMicros),
      ("gt", col("ts") > lit30, _ > boundaryMicros),
      ("lt", col("ts") < lit30, _ < boundaryMicros),
      ("leq", col("ts") <= lit30, _ <= boundaryMicros),
      ("geq_rev", lit30 >= col("ts"), m => boundaryMicros >= m),
      ("lt_rev", lit30 < col("ts"), m => boundaryMicros < m))
    for ((name, cond, p) <- cases) {
      val got = df.filter(cond).select("raw").as[Long].collect().toSet
      assert(got == expectMicros(p), s"case $name")
    }
  }

  test("rewritten plan pushes a raw-long range filter to the scan") {
    val plan = operators.Analytics.timeRangeScan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,17"), plan.linesIterator.take(30).mkString("\n"))
  }
}
