package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet filter pushdown through the nanos→micros timestamp
  * conversion.
  *
  * The `events` table stores TIMESTAMP(NANOS), which Spark reads as a
  * raw LONG (`spark.sql.legacy.parquet.nanosAsLong`); [[graft.Tables]]
  * converts it with `timestamp_micros(ts DIV 1000)`. Any time-range
  * predicate then compares a *derived* expression, so nothing reaches
  * the scan — `PushedFilters: [IsNotNull(ts)]` — and at 100 TB the
  * time-range access path (the reference's `raw_logs(timestamp)` btree,
  * postgres/init.sql:80) would degrade to a full scan.
  *
  * For non-negative longs, truncating division is exactly invertible on
  * comparisons: `a DIV 1000 >= T ⟺ a >= T*1000`, `a DIV 1000 < T ⟺
  * a < T*1000`, and likewise for >, <=. This rule rewrites comparisons
  * of `MicrosToTimestamp(IntegralDivide(a, 1000))` against timestamp
  * literals into comparisons of `a` against micros*1000 — a raw-column
  * predicate that Catalyst pushes into the parquet scan (row-group
  * min/max skipping; partition pruning on a partitioned layout).
  *
  * Registered via `spark.experimental.extraOptimizations` (post-hoc
  * optimizer batch, which still runs before physical planning computes
  * PushedFilters).
  */
object NanosPushdown extends Rule[LogicalPlan] {

  /** Matches MicrosToTimestamp(IntegralDivide(a, 1000)) → a. */
  private object NanosToTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(a, Literal(1000L, LongType), _)) => Some(a)
      case _ => None
    }
  }

  /** Timestamp literal → its micros value scaled to nanos, if exact. */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(micros: Long, TimestampType)
          if micros >= 0 && micros <= Long.MaxValue / 1000 =>
        Some(micros * 1000L)
      case _ => None
    }
  }

  /** Exact nanos bound for `a DIV 1000 {>=,<} T(=n/1000)`.
    *
    * IntegralDivide truncates toward ZERO, not -∞, so for negative `a`
    * the quotient rounds up: a ∈ [-999, -1] gives a DIV 1000 = 0. TsLit
    * only matches n >= 0; for n > 0 the naive bound `n` is exact for
    * every `a` (negative `a` fails both sides), but for the epoch
    * literal n == 0 the satisfying range extends down to -999 — the
    * naive rewrite would silently re-classify pre-1970 rows within one
    * microsecond of the epoch. The `n + 1000` bounds used by the
    * strict/flipped cases are exact for all `a` since n + 1000 > 0.
    */
  private def lowerBound(n: Long): Long = if (n == 0L) -999L else n

  private def rewrite(c: Expression): Expression = c transformUp {
    case GreaterThanOrEqual(NanosToTs(a), TsLit(n)) => GreaterThanOrEqual(a, Literal(lowerBound(n)))
    case GreaterThan(NanosToTs(a), TsLit(n)) => GreaterThanOrEqual(a, Literal(n + 1000L))
    case LessThan(NanosToTs(a), TsLit(n)) => LessThan(a, Literal(lowerBound(n)))
    case LessThanOrEqual(NanosToTs(a), TsLit(n)) => LessThan(a, Literal(n + 1000L))
    case GreaterThanOrEqual(TsLit(n), NanosToTs(a)) => LessThan(a, Literal(n + 1000L))
    case GreaterThan(TsLit(n), NanosToTs(a)) => LessThan(a, Literal(lowerBound(n)))
    case LessThan(TsLit(n), NanosToTs(a)) => GreaterThanOrEqual(a, Literal(n + 1000L))
    case LessThanOrEqual(TsLit(n), NanosToTs(a)) => GreaterThanOrEqual(a, Literal(lowerBound(n)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val r = rewrite(cond)
      if (r fastEquals cond) f else Filter(r, child)
  }
}
