package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, In, LessThan,
  LessThanOrEqual, Literal, PredicateHelper}
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
  * probe row must match a build row and vice versa). The batch
  * deliberately does NOT include PushDownPredicates (re-running it costs
  * ~0.1 s/query — see the Engine.scala batch comment and NOTES.md):
  * PhysicalOperation collects the new Filter at planning time and folds
  * it into the scan, where it becomes a pushed parquet filter /
  * partition prune (SemiJoinValueTransferSpec asserts PushedFilters).
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
          keyPreds(right, from = r, to = l)
        }.filterNot(satisfied(left, _))
        val toRight = pairs.flatMap { case (l, r) =>
          keyPreds(left, from = l, to = r)
        }.filterNot(satisfied(right, _))
        val newLeft =
          if (toLeft.isEmpty) left else Filter(toLeft.reduce(And), left)
        val newRight =
          if (toRight.isEmpty) right else Filter(toRight.reduce(And), right)
        if (toLeft.isEmpty && toRight.isEmpty) j
        else j.copy(left = newLeft, right = newRight)
      }
  }

  /** Single-key literal predicates `p`'s constraints prove about
    * `from`, rewritten onto the partner key `to`. A semi join's
    * survivors equal some row of the other side on the key, so ANY key
    * predicate transfers (the reference's value-transfer covers the
    * same class: =, ranges, IN). Only same-typed keys transfer —
    * rebinding a literal comparison onto a differently-typed attribute
    * would need a cast and loses pushdown anyway.
    */
  private def keyPreds(p: LogicalPlan, from: Attribute,
      to: Attribute): Seq[Expression] =
    if (from.dataType != to.dataType) Seq.empty
    else p.constraints.toSeq.collect {
      case EqualTo(x: Attribute, l: Literal)
          if x.semanticEquals(from) && l.value != null => EqualTo(to, l)
      case EqualTo(l: Literal, x: Attribute)
          if x.semanticEquals(from) && l.value != null => EqualTo(to, l)
      case GreaterThan(x: Attribute, l: Literal)
          if x.semanticEquals(from) && l.value != null => GreaterThan(to, l)
      case GreaterThan(l: Literal, x: Attribute)
          if x.semanticEquals(from) && l.value != null => LessThan(to, l)
      case GreaterThanOrEqual(x: Attribute, l: Literal)
          if x.semanticEquals(from) && l.value != null =>
        GreaterThanOrEqual(to, l)
      case GreaterThanOrEqual(l: Literal, x: Attribute)
          if x.semanticEquals(from) && l.value != null =>
        LessThanOrEqual(to, l)
      case LessThan(x: Attribute, l: Literal)
          if x.semanticEquals(from) && l.value != null => LessThan(to, l)
      case LessThan(l: Literal, x: Attribute)
          if x.semanticEquals(from) && l.value != null => GreaterThan(to, l)
      case LessThanOrEqual(x: Attribute, l: Literal)
          if x.semanticEquals(from) && l.value != null =>
        LessThanOrEqual(to, l)
      case LessThanOrEqual(l: Literal, x: Attribute)
          if x.semanticEquals(from) && l.value != null =>
        GreaterThanOrEqual(to, l)
      case In(x: Attribute, vs)
          if x.semanticEquals(from) &&
            vs.forall(v => v.isInstanceOf[Literal] &&
              v.asInstanceOf[Literal].value != null) => In(to, vs)
    }

  /** True when `p`'s constraints already entail `pred` (fixpoint guard:
    * the Filter this rule adds satisfies it on the next pass).
    */
  private def satisfied(p: LogicalPlan, pred: Expression): Boolean =
    p.constraints.exists(_.semanticEquals(pred))
}
