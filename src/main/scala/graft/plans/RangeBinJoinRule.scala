package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Auto-binning rewrite for interval (range) joins.
  *
  * A join whose only cross-side condition is a pair of inequalities —
  * `point >= lo AND point <= hi`, the attribution-window / interval-
  * containment shape — has no equi key, so Spark plans it as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * fits in memory): O(|L|·|R|) comparisons, the classic 100 TB
  * scale-killer. This rule rewrites the join into an equi-join on a
  * derived bin column:
  *
  *  - the point side gains `bin = point div W`,
  *  - the interval side explodes `sequence(lo div W, hi div W)` (each
  *    interval lands in every bin it overlaps),
  *  - the join becomes `binₗ = binᵣ AND <original condition>` — a plain
  *    shuffled hash/sort-merge join; the residual original predicate
  *    keeps exact semantics, the bins only prune candidates.
  *
  * Correctness: integral `div` is monotone, so `lo <= p <= hi` implies
  * `bin(p) ∈ [bin(lo), bin(hi)]` — every matching pair meets in exactly
  * one bucket (the point's single bin), so no duplicates and no misses.
  * NULL points/bounds produce NULL bins or empty sequences and drop, as
  * the original inner-join predicate would. Inverted intervals (lo > hi)
  * enumerate a descending sequence whose junk candidates the residual
  * predicate rejects.
  *
  * Scope guards (when the rule does NOT fire): bin width unset
  * (`spark.graft.rangeJoin.binSize`, the user's interval-scale opt-in —
  * the same contract as Databricks' range-join hint), non-INNER joins,
  * joins that already carry a cross-side equality (Spark hash-joins
  * those fine; binning would only add overhead), non-integral or
  * non-deterministic point/bound expressions. The rewrite itself
  * introduces a cross-side equality, so it can never re-fire on its own
  * output.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * (SparkSessions wires it into every graft session). The reference has
  * no optimizer surface at all (SURVEY.md §4.1); this is the engine's
  * whole-plan extension tier, option (c) of the custom-operator ladder.
  */
object RangeBinJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binSize"

  /** One inequality conjunct read as "point is bounded by expr". */
  private case class BoundRef(
      point: Expression, pointOnLeft: Boolean, bound: Expression, isLower: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSize =
      try conf.getConfString(ConfKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (binSize <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, binSize).getOrElse(j)
    }
  }

  private def rewrite(j: Join, cond: Expression, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty || !e.deterministic) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(true)
      else if (e.references.subsetOf(j.right.outputSet)) Some(false)
      else None

    // Already has a usable equi key across sides → leave it to the
    // native hash joins.
    val hasCrossEquality = conjuncts.exists {
      case EqualTo(a, b) =>
        (side(a), side(b)) match {
          case (Some(sa), Some(sb)) => sa != sb
          case _ => false
        }
      case _ => false
    }
    if (hasCrossEquality) return None

    def integral(e: Expression): Boolean =
      e.dataType == LongType || e.dataType == IntegerType

    // Read every inequality both ways: a >= b is "a lower-bounded by b"
    // AND "b upper-bounded by a"; pick whichever pairs up.
    def refs(point: Expression, bound: Expression, lower: Boolean): Seq[BoundRef] =
      (side(point), side(bound)) match {
        case (Some(sp), Some(sb)) if sp != sb && integral(point) && integral(bound) =>
          Seq(BoundRef(point, sp, bound, lower))
        case _ => Seq.empty
      }
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => refs(a, b, lower = true) ++ refs(b, a, lower = false)
      case GreaterThan(a, b)        => refs(a, b, lower = true) ++ refs(b, a, lower = false)
      case LessThanOrEqual(a, b)    => refs(a, b, lower = false) ++ refs(b, a, lower = true)
      case LessThan(a, b)           => refs(a, b, lower = false) ++ refs(b, a, lower = true)
      case _ => Seq.empty
    }
    val banded = bounds.groupBy(b => (b.point.canonicalized, b.pointOnLeft)).values.find { g =>
      g.exists(_.isLower) && g.exists(!_.isLower)
    }
    banded.map { g =>
      val pointOnLeft = g.head.pointOnLeft
      val point = g.head.point
      val lo = g.find(_.isLower).get.bound
      val hi = g.find(!_.isLower).get.bound

      def bin(e: Expression): Expression =
        IntegralDivide(Cast(e, LongType), Literal(w, LongType))

      val pointAlias = Alias(bin(point), "__graft_bin_p")()
      val (pointChild, boundChild) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
      val pointPlan = Project(pointChild.output :+ pointAlias, pointChild)

      // Post-analysis construction: TimeZoneAwareExpressions only count
      // as resolved once the zone is pinned (the analyzer's job, so ours
      // here).
      val seq = Sequence(bin(lo), bin(hi), None, Some(conf.sessionLocalTimeZone))
      val elemNullable = seq.dataType.asInstanceOf[ArrayType].containsNull
      val binAttr = AttributeReference("__graft_bin_i", LongType, nullable = elemNullable)()
      val boundPlan = Generate(
        Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(binAttr), child = boundChild)

      val newCond = And(EqualTo(pointAlias.toAttribute, binAttr), cond)
      val (newLeft, newRight) = if (pointOnLeft) (pointPlan, boundPlan) else (boundPlan, pointPlan)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
