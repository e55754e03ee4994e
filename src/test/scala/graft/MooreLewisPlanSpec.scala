package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import graft.operators.CorpusAudit

/** Plan-shape guard for the Moore-Lewis scoring join (VERDICT r17
  * finding 1): the candidate side of the `llr` join must be the
  * per-(doc_id, lang, word) COUNT aggregate, never the raw per-token
  * stream. One row per token occurrence keyed on a Zipfian `word`
  * column is invisible at fixture scale and fatal at 100 TB (the
  * "the"/"of" partitions carry billions of rows; AQE skew-split moves
  * the straggler, not the shuffled volume), while the composite-key
  * count aggregate collapses repeats map-side and spreads the Zipf
  * mass across documents. The optimized LOGICAL plan is inspected
  * (the [[PlanGuardSpec]] convention): the token expansion sits behind
  * a barrier (LogicalRDD leaf), so the guard asserts that every join
  * whose condition references `word` has a child subtree whose FIRST
  * aggregate below the join groups on exactly {doc_id, lang, word}.
  */
class MooreLewisPlanSpec extends SparkSpec {

  /** Joins in the optimized plan whose condition references `word` —
    * the scoring join; the totals/unk cross joins have no condition.
    */
  private def wordJoins(df: DataFrame): Seq[Join] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(
        _.references.exists(_.name == "word")) => j
    }

  /** The topmost aggregates of a subtree (no aggregate between them
    * and the root of the subtree).
    */
  private def topAggregates(p: LogicalPlan): Seq[Aggregate] = p match {
    case a: Aggregate => Seq(a)
    case other        => other.children.flatMap(topAggregates)
  }

  private def assertCountAggBelowScoringJoin(df: DataFrame): Unit = {
    val joins = wordJoins(df)
    assert(joins.nonEmpty, "no scoring join on `word` found — the " +
      "guard's anchor moved; re-pin it before trusting the plan shape")
    joins.foreach { j =>
      val groupings = (topAggregates(j.left) ++ topAggregates(j.right))
        .map(_.groupingExpressions.flatMap(_.references.map(_.name)).toSet)
      assert(groupings.contains(Set("doc_id", "lang", "word")),
        s"the scoring join's candidate side must be the per-(doc_id, " +
          s"lang, word) count aggregate (found groupings: $groupings) — " +
          s"joining the raw per-token stream shuffles one row per " +
          s"occurrence on a Zipfian key (VERDICT r17 finding 1)")
    }
  }

  test("mooreLewisSelect: scoring join reads per-(doc,word) counts, not tokens") {
    assertCountAggBelowScoringJoin(CorpusAudit.mooreLewisSelect(spark, sf))
  }

  test("mooreLewisDelta: scoring join reads per-(doc,word) counts, not tokens") {
    assertCountAggBelowScoringJoin(CorpusAudit.mooreLewisDelta(spark, sf))
  }
}
