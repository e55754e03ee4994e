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
          val plan = fn(spark, sf).queryExecution.executedPlan
          val bad = plan.collect {
            case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
          }
          if (bad.nonEmpty) Some(name) else None
        } catch {
          case e: Throwable => Some(s"$name (planning failed: ${e.getMessage})")
        }
    }
    assert(offenders.isEmpty,
      s"non-broadcast cartesian-product plans: $offenders")
  }
}
