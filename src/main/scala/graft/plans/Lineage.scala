package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression,
  NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Column-lineage extraction — the reference's lineage graph
  * (`PlannerTest/lineage.test`, fe ColumnLineageGraph): every output
  * column's transitive VALUE sources (PROJECTION edges) down to base
  * relation columns, plus the base columns referenced by predicates —
  * WHERE/ON conjuncts, GROUP BY, ORDER BY, window partition/order keys
  * (PREDICATE edges).
  *
  * Walks the ANALYZED logical plan (pre-optimization, so user-written
  * structure is intact). Vertex ids are `table.column` where `table` is
  * the mounted view name (the reference prints `db.table.column`; the
  * engine's catalog is database-less by corpus policy).
  *
  * Simplification vs the reference (documented divergence): the
  * reference partitions predicate dependencies into one edge per
  * predicate scope; here all predicate sources form one edge targeting
  * every output — the SOURCE/TARGET sets, which is what governance
  * consumers join on, are the same.
  */
object Lineage {

  final case class Graph(
      projections: Seq[(String, Set[String])], // output column -> base cols
      predicates: Set[String]) {

    /** The reference's JSON shape (edges/vertices; the hash/user/
      * timestamp run-environment fields are omitted). Targets number
      * first, then sources, as in the reference's vertex ordering.
      */
    def toJson(queryText: String): String = {
      val targets = projections.map(_._1)
      val sources = (projections.flatMap(_._2) ++ predicates)
        .distinct.sorted.filterNot(targets.contains)
      val ids = (targets ++ sources).zipWithIndex.toMap
      def arr(xs: Seq[Int]): String = xs.sorted.mkString("[", ",", "]")
      def q(s: String): String =
        "\"" + s.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case c => c.toString
        } + "\""
      val projEdges = projections.map { case (t, ss) =>
        s"""{"sources":${arr(ss.toSeq.map(ids))},"targets":${arr(Seq(ids(t)))},"edgeType":"PROJECTION"}"""
      }
      val predEdge =
        if (predicates.isEmpty) Seq.empty
        else Seq(
          s"""{"sources":${arr(predicates.toSeq.map(ids))},"targets":${arr(targets.map(ids))},"edgeType":"PREDICATE"}""")
      val vertices = ids.toSeq.sortBy(_._2).map { case (v, i) =>
        s"""{"id":$i,"vertexType":"COLUMN","vertexId":${q(v)}}"""
      }
      s"""{"queryText":${q(queryText)},"edges":${(projEdges ++ predEdge).mkString("[", ",", "]")},"vertices":${vertices.mkString("[", ",", "]")}}"""
    }
  }

  /** Lineage of a DataFrame's analyzed plan. */
  def of(df: DataFrame): Graph = {
    val plan = df.queryExecution.analyzed
    val (m, preds) = walk(plan)
    Graph(plan.output.map(a => a.name -> m.getOrElse(a.exprId.id, Set.empty)),
      preds)
  }

  private type SourceMap = Map[Long, Set[String]]

  private def refs(e: Expression, m: SourceMap): Set[String] =
    e.references.toSeq.flatMap(a => m.getOrElse(a.exprId.id, Set.empty)).toSet

  /** Returns (output-attr exprId -> base columns, predicate columns). */
  private def walk(plan: LogicalPlan): (SourceMap, Set[String]) = plan match {
    case sa @ SubqueryAlias(ident, child) if isBaseRelation(child) =>
      // a named base relation (temp views analyze to
      // SubqueryAlias(name, View(relation))): every column roots here.
      // A user alias wraps ANOTHER SubqueryAlias, which is not a base
      // relation, so the view's own name wins over the alias.
      val name = ident.name
      (sa.output.map(a => a.exprId.id -> Set(s"$name.${a.name}")).toMap,
        Set.empty)

    case p: Project =>
      val (m, preds) = walk(p.child)
      (named(p.projectList, m), preds ++ subqueryPreds(p.projectList, m))

    case a: Aggregate =>
      val (m, preds) = walk(a.child)
      (named(a.aggregateExpressions, m),
        preds ++ a.groupingExpressions.flatMap(refs(_, m)))

    case f: Filter =>
      val (m, preds) = walk(f.child)
      (m, preds ++ refs(f.condition, m) ++ subqueryPreds(Seq(f.condition), m))

    case j: Join =>
      val (lm, lp) = walk(j.left)
      val (rm, rp) = walk(j.right)
      val m = lm ++ rm
      (m, lp ++ rp ++ j.condition.map(refs(_, m)).getOrElse(Set.empty))

    case u: Union =>
      val walked = u.children.map(walk)
      val preds = walked.flatMap(_._2).toSet
      // output column i unions every child's column i sources
      val m = u.output.zipWithIndex.map { case (out, i) =>
        out.exprId.id -> u.children.zip(walked).flatMap { case (c, (cm, _)) =>
          cm.getOrElse(c.output(i).exprId.id, Set.empty)
        }.toSet
      }.toMap
      (m, preds)

    case w: Window =>
      val (m, preds) = walk(w.child)
      // an analytic's VALUE comes from its function arguments; the
      // partition/order keys are predicate dependencies (the
      // reference's model in lineage.test's analytic blocks)
      val winMap = w.windowExpressions.map { ne =>
        val funcRefs = ne.collect {
          case we: org.apache.spark.sql.catalyst.expressions.WindowExpression =>
            refs(we.windowFunction, m)
        }.flatten.toSet
        ne.exprId.id -> (if (funcRefs.nonEmpty) funcRefs else refs(ne, m))
      }.toMap
      (m ++ winMap,
        preds ++ (w.partitionSpec ++ w.orderSpec).flatMap(refs(_, m)))

    case s: Sort =>
      val (m, preds) = walk(s.child)
      (m, preds ++ s.order.flatMap(refs(_, m)))

    case g: Generate =>
      val (m, preds) = walk(g.child)
      val genSrc = refs(g.generator, m)
      (m ++ g.generatorOutput.map(a => a.exprId.id -> genSrc), preds)

    case _ if plan.children.nonEmpty =>
      // passthrough nodes (limits, distinct, repartition, aliases over
      // non-leaf plans, ...): merge children, keep ids
      val walked = plan.children.map(walk)
      (walked.map(_._1).reduce(_ ++ _), walked.flatMap(_._2).toSet)

    case _ =>
      // anonymous leaf (LocalRelation, range, ...): constants, no roots
      (plan.output.map(_.exprId.id -> Set.empty[String]).toMap, Set.empty)
  }

  /** True for a leaf relation, possibly wrapped in View nodes (temp
    * views) — but NOT another SubqueryAlias (a user alias).
    */
  private def isBaseRelation(p: LogicalPlan): Boolean = p match {
    case v: View => isBaseRelation(v.child)
    case _: SubqueryAlias => false
    case l => l.children.isEmpty
  }

  private def named(es: Seq[NamedExpression], m: SourceMap): SourceMap =
    es.map {
      case a: Attribute => a.exprId.id -> m.getOrElse(a.exprId.id, Set.empty)
      case ne => ne.exprId.id -> refs(ne, m)
    }.toMap

  /** Columns referenced inside expression subqueries (IN/EXISTS/scalar)
    * count as predicate dependencies, as in the reference.
    */
  private def subqueryPreds(es: Seq[Expression], m: SourceMap): Set[String] =
    es.flatMap(_.collect {
      case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        val (im, ip) = walk(sq.plan)
        sq.plan.output.flatMap(a => im.getOrElse(a.exprId.id, Set.empty))
          .toSet ++ ip
    }).flatten.toSet
}
