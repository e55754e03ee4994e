package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Fleet-wide plan guards over the WHOLE query surface — assertions on
  * what every registered query COMPILES to, not what it returns. The
  * first guard pins the r9 fix class: an unpartitioned window moves one
  * row per input row into a single partition, which is invisible at
  * test scale and fatal at 100 TB (the `lmQuality` ntile and
  * `vocabCoverage` rank/cumsum both shipped that way before r9). The
  * optimized logical plan is inspected, so a literal partition key —
  * which Catalyst folds away — is caught too.
  */
class PlanGuardSpec extends SparkSpec {

  test("no registered query compiles to an unpartitioned global window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.optimizedPlan
          val bad = plan.collect {
            case w: LogicalWindow if w.partitionSpec.isEmpty => w
          }
          if (bad.nonEmpty) Some(name) else None
        } catch {
          case e: Throwable => Some(s"$name (planning failed: ${e.getMessage})")
        }
    }
    assert(offenders.isEmpty,
      s"single-partition global-window plans (the lmQuality-ntile scale " +
        s"trap class): $offenders")
  }

  /** AQE (on by default in Spark 4) wraps any plan with exchanges in
    * `AdaptiveSparkPlanExec` — a LeafExecNode whose `collect()` never
    * descends into the wrapped plan, so a node-type match is vacuously
    * green for exactly the query class this guard polices. The rendered
    * tree string always shows the current physical plan through the
    * adaptive wrapper (and through subquery plans), so match on that,
    * like the sibling window-guard matches the logical plan.
    */
  private def plansCartesian(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("CartesianProduct")

  test("no registered query executes a non-broadcast cartesian product") {
    // Every cross join in the fleet must broadcast its small side
    // (BroadcastNestedLoopJoin); a CartesianProductExec shuffles BOTH
    // sides all-to-all — |A|×|B| partition pairs, invisible at fixture
    // scale and fatal at 100 TB. The two documented exact all-pairs
    // baselines (Similarity.nearDupPairs / bruteTopK) broadcast their
    // small side too, so NO query is exempt.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (plansCartesian(fn(spark, sf))) Some(name) else None
        } catch {
          case e: Throwable => Some(s"$name (planning failed: ${e.getMessage})")
        }
    }
    assert(offenders.isEmpty,
      s"non-broadcast cartesian-product plans: $offenders")
  }

  test("every exact-percentile aggregate is limit-bounded or on the documented allowlist") {
    // Spark's exact `percentile` is an all-values-buffering
    // ImperativeAggregate: the final merge task holds EVERY input value
    // of its group in memory. Over corpus-cardinality input that is the
    // silent scale killer VERDICT r13 found in the DSIR cutpoint (fixed
    // by the hash-sampled top-K — its percentile now reads a
    // GlobalLimit-bounded child). Each allowlisted query carries a
    // scaladoc line stating its input-cardinality bound and the
    // documented approx/hash-sampled swap for 100 TB; any NEW exact
    // percentile must either sit above a limit or join the allowlist
    // with the same documentation (VERDICT r13 item 8).
    import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit}
    val documented = Set(
      "q_latency_percentiles", // row-scale per event_type; approx sibling is the scale path
      "q_mad_anomaly",         // row-scale per event_type; documented approx swap
      "q_skew_profile",        // one row per distinct key; documented approx swap
      "q_user_deciles")        // one row per distinct user; documented approx swap
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.optimizedPlan
          val unbounded = plan.collect {
            case a: Aggregate if a.aggregateExpressions
              .exists(_.exists(_.isInstanceOf[Percentile])) =>
              a.child.collectFirst { case _: GlobalLimit => () }.isEmpty
          }
          if (unbounded.exists(identity) && !documented(name)) Some(name) else None
        } catch {
          case e: Throwable => Some(s"$name (planning failed: ${e.getMessage})")
        }
    }
    assert(offenders.isEmpty,
      s"exact percentile over non-limit-bounded input outside the " +
        s"documented allowlist: $offenders")
  }

  test("the cartesian detector fires through the AQE wrapper (positive control)") {
    // Non-vacuousness proof: a deliberate cartesian (broadcast disabled,
    // cross join, both sides shuffled so AQE wraps the plan) must be
    // caught, and the same join WITH broadcast must pass.
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = spark.range(100).toDF("x").repartition(2)
      val b = spark.range(100).toDF("y").repartition(2)
      assert(plansCartesian(a.crossJoin(b)),
        "detector missed a deliberate CartesianProductExec under AQE")
      assert(!plansCartesian(
        a.crossJoin(org.apache.spark.sql.functions.broadcast(b))),
        "detector false-positived on a broadcast nested-loop join")
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
