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

  test("epoch-boundary rewrite is exact for pre-1970 nanos") {
    // IntegralDivide truncates toward ZERO: nanos in [-999, -1] land on
    // micro 0, i.e. they SATISFY ts >= epoch. The naive `a >= T*1000`
    // rewrite re-classified exactly those rows; lowerBound(0) = -999
    // keeps them. Expected side models truncation with Java `/` (which
    // also truncates toward zero) — NOT floorDiv.
    spark.experimental.extraOptimizations = Seq(graft.plans.NanosPushdown)
    val nanos = Seq(-2000L, -1001L, -1000L, -999L, -500L, -1L, 0L, 1L,
      999L, 1000L, 1500L)
    val df = nanos.toDF("raw")
      .withColumn("ts", timestamp_micros(expr("raw DIV 1000L")))
    val epoch = lit("1970-01-01 00:00:00").cast("timestamp")
    def expect(p: Long => Boolean): Set[Long] =
      nanos.filter(n => p(n / 1000L)).toSet
    val cases: Seq[(String, org.apache.spark.sql.Column, Long => Boolean)] = Seq(
      ("geq", col("ts") >= epoch, _ >= 0L),
      ("gt", col("ts") > epoch, _ > 0L),
      ("lt", col("ts") < epoch, _ < 0L),
      ("leq", col("ts") <= epoch, _ <= 0L),
      ("gt_rev", epoch > col("ts"), m => 0L > m),
      ("leq_rev", epoch <= col("ts"), m => 0L <= m))
    for ((name, cond, p) <- cases) {
      val got = df.filter(cond).select("raw").as[Long].collect().toSet
      assert(got == expect(p), s"case $name: got $got expected ${expect(p)}")
    }
  }

  test("time-range predicate reaches the parquet scan as a pushed filter") {
    // Layout-agnostic: on the nanos fixture the rule rewrites to a
    // raw-long bound (GreaterThanOrEqual(ts,17...)); on the native
    // micros fixture Spark pushes the timestamp bound directly. Either
    // way a ts range filter must appear in PushedFilters.
    val plan = operators.Analytics.timeRangeScan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,"), plan.linesIterator.take(30).mkString("\n"))
  }
}
