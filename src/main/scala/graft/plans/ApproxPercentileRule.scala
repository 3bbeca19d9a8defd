package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** AQP rewrite #2, the quantile sibling of [[ApproxDistinctRule]]:
  * `percentile(x, p)` → `approx_percentile(x, p, accuracy)` when the
  * session opts in.
  *
  * Exact percentile is the OTHER classic scale cliff: Catalyst plans it
  * as an ObjectHashAggregate whose per-group state is EVERY input value
  * (an OpenHashMap of value → count) — at 100 TB the group's distinct
  * values themselves become executor memory. ApproximatePercentile
  * carries a Greenwald-Khanna summary bounded by the accuracy knob
  * instead: fixed-size mergeable state, same two-phase aggregation.
  *
  * Contract: CHANGES SEMANTICS twice over — (a) rank error ≤
  * n/accuracy, and (b) approx_percentile returns a nearest ACTUAL
  * value where percentile INTERPOLATES between the two straddling
  * values, so even an uncompressed summary differs on even-count
  * groups by up to one value gap. Hence the rule fires only when
  * `spark.graft.approxPercentile.accuracy` is set ≥ 100 — the explicit
  * AQP opt-in, mirroring approxDistinct.k.
  *
  * Scope guards: only DOUBLE-typed children (for integer children the
  * two functions disagree on RESULT TYPE — percentile returns DOUBLE,
  * approx_percentile returns the input type — and swapping would change
  * the schema); only unit frequency; percentage must be foldable
  * (approx_percentile requires it). resultId is preserved so upstream
  * references don't re-resolve. Never re-fires (no Percentile remains).
  */
object ApproxPercentileRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxPercentile.accuracy"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val accuracy =
      try conf.getConfString(ConfKey, "0").toInt
      catch { case _: NumberFormatException => 0 }
    if (accuracy < 100) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(p: Percentile, _, false, _, _)
              if p.child.dataType == DoubleType && p.child.deterministic &&
                p.percentageExpression.foldable &&
                p.frequencyExpression.foldable &&
                java.util.Objects.equals(p.frequencyExpression.eval(), 1L) =>
            ae.copy(aggregateFunction = ApproximatePercentile(
              p.child, p.percentageExpression, Literal(accuracy), 0, 0))
        }
    }
  }
}
