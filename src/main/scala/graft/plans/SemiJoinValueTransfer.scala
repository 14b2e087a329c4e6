package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Literal value transfer across SEMI joins.
  *
  * The reference's ValueTransferGraph (fe StmtRewriter/analysis) carries
  * a literal equality through any equi-join — including the semi joins
  * produced by IN-subqueries — so `t.k IN (SELECT k FROM d WHERE k = 7)`
  * scans t with k = 7 (PlannerTest/runtime-filter-propagation.test:463,
  * predicate-propagation.test:494-539). Spark's own
  * InferFiltersFromConstraints would draw the same inference, but it
  * runs in the operator-optimization batch, BEFORE
  * RewritePredicateSubquery turns the IN predicate into a LeftSemi join
  * — so the transfer never happens for subquery spellings.
  *
  * This rule runs in the user optimizer batch (after RewriteSubquery,
  * like [[SemiJoinBuildDedup]]) and closes the ordering gap: for every
  * LeftSemi equi-pair l = r where one side's constraint set proves the
  * attribute equals a literal, the matching literal filter is added to
  * the other side (sound in both directions for semi joins: a surviving
  * probe row must match a build row and vice versa). PushDownPredicates
  * runs after it in the same batch, sinking the new Filter into the
  * scan where it becomes a pushed parquet filter / partition prune.
  *
  * At 100 TB this is the difference between scanning a fact table and
  * pruning it: a selective IN-subquery's literal reaches the fact scan
  * statically, before runtime filters even start.
  */
object SemiJoinValueTransfer extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, LeftSemi, Some(cond), _) =>
      val pairs = splitConjunctivePredicates(cond).collect {
        case EqualTo(l: Attribute, r: Attribute)
            if left.outputSet.contains(l) && right.outputSet.contains(r) =>
          (l, r)
        case EqualTo(r: Attribute, l: Attribute)
            if left.outputSet.contains(l) && right.outputSet.contains(r) =>
          (l, r)
      }
      if (pairs.isEmpty) j
      else {
        val toLeft = pairs.flatMap { case (l, r) =>
          literalFor(right, r).map(EqualTo(l, _))
        }.filterNot(satisfied(left, _))
        val toRight = pairs.flatMap { case (l, r) =>
          literalFor(left, l).map(EqualTo(r, _))
        }.filterNot(satisfied(right, _))
        val newLeft =
          if (toLeft.isEmpty) left else Filter(toLeft.reduce(And), left)
        val newRight =
          if (toRight.isEmpty) right else Filter(toRight.reduce(And), right)
        if (toLeft.isEmpty && toRight.isEmpty) j
        else j.copy(left = newLeft, right = newRight)
      }
  }

  /** The literal `a` provably equals under `p`'s constraints, if any. */
  private def literalFor(p: LogicalPlan, a: Attribute): Option[Literal] =
    p.constraints.collectFirst {
      case EqualTo(x: Attribute, l: Literal)
          if x.semanticEquals(a) && l.value != null => l
      case EqualTo(l: Literal, x: Attribute)
          if x.semanticEquals(a) && l.value != null => l
    }

  /** True when `p`'s constraints already entail `pred` (fixpoint guard:
    * the Filter this rule adds satisfies it on the next pass).
    */
  private def satisfied(p: LogicalPlan, pred: Expression): Boolean =
    p.constraints.exists(_.semanticEquals(pred))
}
