package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

import graft.sketch.KmvDistinct

/** Approximate-query-processing rewrite: COUNT(DISTINCT x) → a KMV
  * sketch estimate, when the session opts in.
  *
  * Exact distinct counting is the classic scale cliff: Catalyst plans it
  * as an Expand + two aggregation phases whose state grows with the true
  * cardinality — at 100 TB the distinct keys themselves become the
  * shuffle. The KMV aggregate ([[KmvDistinct]]) carries AT MOST k hashes
  * per group through map-side partial aggregation, a fixed 8k-byte
  * bound, and its estimate is deterministic (md5 hashing — same answer
  * on any partitioning, unlike sampling).
  *
  * Contract: this rule CHANGES SEMANTICS (exact → estimate), so it only
  * fires when `spark.graft.approxDistinct.k` is set to a positive k —
  * the explicit AQP opt-in, like `approx_count_distinct` but without
  * touching query text. Groups with fewer than k distinct values still
  * get EXACT answers (the sketch's below-k branch), so a generous k
  * makes the rewrite lossless on all but the heaviest groups.
  *
  * Scope guards: single-argument COUNT(DISTINCT x) only (multi-column
  * distinct tuples and other distinct aggregates are left exact); the
  * FILTER clause is preserved; the replacement keeps Count's LongType
  * and result ids, so nothing upstream re-resolves. Result: the rounded
  * estimate; never re-fires (no distinct Count remains after rewrite).
  */
object ApproxDistinctRule extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxDistinct.k"

  /** The oracle-replayable 60-bit hash (TextAnalysis.hash60Spark), as
    * catalyst nodes: conv(substr(md5(cast(x as string)), 1, 15), 16, 10). */
  private def hash60(x: Expression): Expression =
    Cast(
      Conv(
        Substring(Md5(Cast(Cast(x, StringType), BinaryType)), Literal(1), Literal(15)),
        Literal(16, IntegerType), Literal(10, IntegerType)),
      LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val k =
      try conf.getConfString(ConfKey, "0").toInt
      catch { case _: NumberFormatException => 0 }
    if (k < 2) plan
    else plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(c)), _, true, _, _)
              if c.deterministic =>
            val kmv = AggregateExpression(
              KmvDistinct(hash60(c), k), ae.mode, isDistinct = false,
              ae.filter, ae.resultId)
            Cast(Round(kmv, Literal(0)), LongType)
        }
    }
  }
}
