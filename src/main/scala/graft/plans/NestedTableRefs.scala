package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._

/** Pre-analysis rewrite of the reference's nested-types TableRefs into
  * Spark Generate/LateralJoin plans.
  *
  * The reference models collections as implicit tables
  * (`fe/.../analysis/CollectionTableRef.java`, planned as
  * SubplanNode/UnnestNode — `fe/.../planner/SingleNodePlanner.java`
  * createSubplan): `FROM complextypestbl.int_array` scans a collection,
  * `FROM tbl t, t.int_array a` is a correlated unnest join, and
  * `FROM tbl t, (SELECT count(*) FROM t.int_array) v` is a per-row
  * subplan aggregate. Spark has no TableRef syntax for this, but its
  * engine has every needed primitive: Generate (unnest), LateralJoin +
  * decorrelation (subplans). This rewriter maps the dialect onto those
  * primitives on the PARSED (unresolved) tree, deciding explode shapes
  * from catalog schemas, and leaves all resolution to Catalyst.
  *
  * Scale note: Generate is a streaming narrow operator (no shuffle, no
  * state) and decorrelated LateralJoin aggregates become ordinary
  * hash-aggregate + join plans, which is exactly how the reference
  * executes SubplanNode per-row streams.
  *
  * Supported forms (the reference's nested-types QueryTest corpus):
  *  - uncorrelated paths:   FROM view.col.path  [alias]
  *  - correlated refs:      FROM t, t.arr a / INNER|LEFT OUTER JOIN t.arr
  *  - anti/semi:            LEFT ANTI|SEMI JOIN t.arr (empty/non-empty)
  *  - lateral subplans:     FROM t, (SELECT ... FROM t.arr) v
  *  - arrays expose pos BIGINT + item (+ struct-item fields), maps
  *    expose key + value; intermediate collections on a path unnest
  *    under hidden names so only the named collection's columns bind.
  */
object NestedTableRefs {

  /** Cheap pre-test: any multi-part relation at all? Must look through
    * expression subqueries (WHERE-clause refs) and innerChildren (CTE
    * definitions), which plan-level collect does not visit.
    */
  def mightApply(plan: LogicalPlan): Boolean = {
    def scan(p: LogicalPlan): Boolean = {
      p.collectFirst {
        case u: UnresolvedRelation if u.multipartIdentifier.length >= 2 => u
      }.nonEmpty ||
      p.collect { case n: LogicalPlan => n }.exists { n =>
        n.innerChildren.exists {
          case lp: LogicalPlan => scan(lp)
          case _ => false
        } ||
        n.expressions.exists(_.collectFirst {
          case sq: SubqueryExpression if scan(sq.plan) => sq
        }.nonEmpty)
      }
    }
    scan(plan)
  }

  def rewrite(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    if (!mightApply(plan)) plan else new NestedRefRewriter(spark).apply(plan)
}

private final class NestedRefRewriter(spark: SparkSession) {

  /** Row type of a named relation in scope: alias -> visible fields. */
  private type Scope = Map[String, StructType]

  private var changed = false
  private var nextId = 0

  def apply(plan: LogicalPlan): LogicalPlan = {
    val out = rewriteNode(plan, Map.empty)
    if (changed) out else plan
  }

  // ---- catalog lookup --------------------------------------------------

  private val viewCache = collection.mutable.Map.empty[String, Option[StructType]]

  private def viewType(name: String): Option[StructType] =
    viewCache.getOrElseUpdate(name.toLowerCase, {
      try Some(spark.table(name).schema)
      catch { case _: Throwable => None }
    })

  private def field(st: StructType, name: String): Option[StructField] =
    st.fields.find(_.name.equalsIgnoreCase(name))

  /** Visible row type of an exploded array element: pos/item plus
    * struct-item fields (how the reference exposes collection tables).
    */
  private def pseudoRow(elem: DataType): StructType = {
    val base = Seq(StructField("pos", LongType), StructField("item", elem))
    elem match {
      case st: StructType => StructType(base ++ st.fields)
      case _ => StructType(base)
    }
  }

  private def mapRow(mt: MapType): StructType = StructType(Seq(
    StructField("key", mt.keyType), StructField("value", mt.valueType)))

  /** Does `parts` walk from rowType through struct fields/collection hops
    * and END on a collection? (The decision test for "this multi-part
    * name is a nested TableRef, not a database.table".)
    */
  private def isCollectionPath(rowType: StructType, parts: Seq[String]): Boolean = {
    if (parts.isEmpty) return false
    var cur: DataType = rowType
    for (p <- parts) {
      val isLast = p eq parts.last
      cur match {
        case st: StructType => field(st, p) match {
          case None => return false
          case Some(f) => f.dataType match {
            case ArrayType(et, _) =>
              if (isLast) return true
              cur = pseudoRow(et)
            case _: MapType => return isLast
            case other =>
              if (isLast) return false
              cur = other
          }
        }
        case _ => return false
      }
    }
    false
  }

  // ---- plan traversal --------------------------------------------------

  private def rewriteNode(plan: LogicalPlan, outer: Scope): LogicalPlan =
    plan match {
      case j: Join => rewriteJoin(j, outer)
      case u: UnresolvedRelation =>
        expandStandalone(u.multipartIdentifier, None, outer).getOrElse(u)
      case s @ SubqueryAlias(id, u: UnresolvedRelation) =>
        expandStandalone(u.multipartIdentifier, Some(id.name), outer)
          .getOrElse(s)
      // CTE definitions are NOT in children (innerChildren only), so
      // mapChildren misses them — correlated WITH views over collection
      // refs (IMPALA-2414) need the explicit walk
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        val defs2 = w.cteRelations.map { case (n, sa, lim) =>
          (n, rewriteNode(sa, outer).asInstanceOf[SubqueryAlias], lim)
        }
        w.copy(child = rewriteNode(w.child, outer), cteRelations = defs2)
      case f: Filter => rewriteFilter(f, outer)
      // `SELECT * FROM view.path` exposes ONLY the final collection's
      // columns in the reference (item for scalar arrays, the struct
      // fields for struct arrays, key/value for maps — never the base
      // table's columns or intermediate unnests), so a bare star over a
      // standalone collection ref rewrites to those columns explicitly.
      case p @ Project(Seq(star: UnresolvedStar), child)
          if star.target.isEmpty =>
        val (inner, cond) = child match {
          case Filter(c, g) => (g, Some(c))
          case g => (g, None)
        }
        val ref = inner match {
          case u: UnresolvedRelation => Some((u.multipartIdentifier, None))
          case SubqueryAlias(id, u: UnresolvedRelation) =>
            Some((u.multipartIdentifier, Some(id.name)))
          case _ => None
        }
        val rewrittenStar = for {
          (parts, alias) <- ref
          cols <- leafPublicCols(parts, outer)
          expanded <- expandStandalone(parts, alias, outer)
        } yield {
          val q = alias.getOrElse(parts.last)
          val base = cond.map(Filter(_, expanded)).getOrElse(expanded)
          Project(cols.map(c =>
            UnresolvedAttribute(Seq(q, c)): NamedExpression), base)
        }
        rewrittenStar.getOrElse(p.mapChildren(c => rewriteNode(c, outer)))
      case other =>
        other.mapChildren(c => rewriteNode(c, outer))
    }

  /** The reference's star expansion for a collection TableRef: walk
    * `parts` to the final collection and name its public columns.
    */
  private def leafPublicCols(parts: Seq[String],
      outer: Scope): Option[Seq[String]] = {
    if (parts.length < 2) return None
    val rowType = outer.get(parts.head.toLowerCase)
      .orElse(viewType(parts.head)).getOrElse(return None)
    var cur: DataType = rowType
    for (p <- parts.tail) {
      val isLast = p eq parts.tail.last
      cur match {
        case st: StructType => field(st, p) match {
          case None => return None
          case Some(f) => f.dataType match {
            case ArrayType(et, _) =>
              if (isLast) return Some(et match {
                case s: StructType => s.fields.map(_.name).toSeq
                case _ => Seq("item")
              })
              cur = pseudoRow(et)
            case mt: MapType =>
              // struct values expand to their fields (complex types
              // are not selectable scalars in the reference's dialect)
              return if (isLast) Some(mt.valueType match {
                case s: StructType => "key" +: s.fields.map(_.name).toSeq
                case _ => Seq("key", "value")
              }) else None
            case other =>
              if (isLast) return None
              cur = other
          }
        }
        case _ => return None
      }
    }
    None
  }

  /** WHERE-clause subqueries over collection refs (scalar, [NOT] EXISTS,
    * [NOT] IN) — the reference's StmtRewriter turns these into joins
    * before planning (`fe/.../analysis/StmtRewriter.java`); Spark's
    * decorrelator does not accept a Generate over an outer array inside
    * an expression subquery, but accepts exactly the same plan as a
    * LATERAL join. So hoist each such subquery into a lateral:
    *   scalar:  LEFT lateral of the single-column subquery (empty -> NULL)
    *   EXISTS:  lateral COUNT(1) > 0 (NOT EXISTS via the enclosing Not)
    *   IN:      lateral [#matches, #null-comparisons] folded into the
    *            exact three-valued IN result (empty set -> FALSE,
    *            null-tainted miss -> NULL), so NOT IN is just Not(...)
    */
  private def rewriteFilter(f: Filter, outer: Scope): LogicalPlan = {
    val child2 = rewriteNode(f.child, outer)
    val scope = outer ++ aliasesOf(child2)

    var plan: LogicalPlan = child2
    var cond: Expression = f.condition

    def freshTag(): String = { nextId += 1; s"__sq$nextId" }

    def lateral(body: LogicalPlan, joinType: JoinType): Unit = {
      plan = LateralJoin(plan, LateralSubquery(body), joinType, None)
    }

    // InSubquery is a predicate over a ListQuery, not itself a
    // SubqueryExpression — collect all three shapes explicitly
    val hoistable: Seq[Expression] = cond.collect {
      case sq: org.apache.spark.sql.catalyst.expressions.ScalarSubquery
          if correlatesWith(sq.plan, scope) => sq
      case sq: org.apache.spark.sql.catalyst.expressions.Exists
          if correlatesWith(sq.plan, scope) => sq
      case in: org.apache.spark.sql.catalyst.expressions.InSubquery
          if correlatesWith(in.query.plan, scope) => in
    }

    hoistable.foreach { sq =>
      val innerPlan = sq match {
        case in: org.apache.spark.sql.catalyst.expressions.InSubquery =>
          in.query.plan
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          s.plan
      }
      val inner = rewriteNode(innerPlan, scope)
      val replacement: Expression = sq match {
        case _: org.apache.spark.sql.catalyst.expressions.ScalarSubquery =>
          val tag = freshTag()
          val col = s"${tag}_v"
          lateral(SubqueryAlias(tag,
            org.apache.spark.sql.catalyst.analysis.UnresolvedSubqueryColumnAliases(
              Seq(col), SubqueryAlias(s"${tag}_i", inner))), LeftOuter)
          UnresolvedAttribute(Seq(tag, col))
        case _: org.apache.spark.sql.catalyst.expressions.Exists =>
          val tag = freshTag()
          val col = s"${tag}_c"
          val agg = Aggregate(Nil, Seq(Alias(
            aggregate.Count(Seq(Literal(1))).toAggregateExpression(), col)()),
            inner)
          lateral(SubqueryAlias(tag, agg), Inner)
          GreaterThan(UnresolvedAttribute(Seq(tag, col)), Literal(0L))
        case in: org.apache.spark.sql.catalyst.expressions.InSubquery =>
          // the outer value must stay OUT of the lateral's aggregates
          // (a mixed outer/local agg argument is undecorrelatable), so
          // the lateral only collects the subquery column and the test
          // happens outside: TRUE on a contained match, NULL when the
          // probe is null against a non-empty set or the set has nulls,
          // FALSE otherwise (incl. the empty set) — exact 3-valued IN
          val v = in.values.head
          val tag = freshTag()
          val fcol = s"${tag}_f"
          val aliased =
            org.apache.spark.sql.catalyst.analysis.UnresolvedSubqueryColumnAliases(
              Seq(fcol), SubqueryAlias(s"${tag}_i", inner))
          val fRef = UnresolvedAttribute(Seq(fcol))
          val arr = s"${tag}_a"
          val n = s"${tag}_n"
          val agg = Aggregate(Nil, Seq(
            Alias(aggregate.CollectList(fRef).toAggregateExpression(), arr)(),
            Alias(aggregate.Count(Seq(CaseWhen(
              Seq((IsNull(fRef), Literal(1))), None))).toAggregateExpression(), n)()),
            aliased)
          lateral(SubqueryAlias(tag, agg), Inner)
          val arrRef = UnresolvedAttribute(Seq(tag, arr))
          val nRef = UnresolvedAttribute(Seq(tag, n))
          val setNonEmpty = GreaterThan(
            Add(Cast(Size(arrRef, legacySizeOfNull = false), LongType), nRef),
            Literal(0L))
          CaseWhen(Seq(
            (EqualNullSafe(ArrayContains(arrRef, v), Literal(true)),
              Literal(true)),
            (And(IsNull(v), setNonEmpty), Literal(null, BooleanType)),
            (GreaterThan(nRef, Literal(0L)), Literal(null, BooleanType))),
            Some(Literal(false)))
        case other => null
      }
      if (replacement != null) {
        changed = true
        cond = cond.transform { case e if e eq sq => replacement }
      }
    }

    // subqueries that stay in place still get their plans rewritten
    // (self-contained collection refs at deeper scopes)
    cond = cond.transform {
      case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression
          if !hoistable.exists(_ eq sq) =>
        sq.withNewPlan(rewriteNode(sq.plan, scope))
    }

    Filter(cond, plan)
  }

  private def rewriteJoin(j: Join, outer: Scope): LogicalPlan = {
    val left = rewriteNode(j.left, outer)
    val scope = outer ++ aliasesOf(left)

    def refOf(p: LogicalPlan): Option[(Seq[String], Option[String])] = p match {
      case u: UnresolvedRelation if u.multipartIdentifier.length >= 2 =>
        Some((u.multipartIdentifier, None))
      case SubqueryAlias(id, u: UnresolvedRelation)
          if u.multipartIdentifier.length >= 2 =>
        Some((u.multipartIdentifier, Some(id.name)))
      case _ => None
    }

    refOf(j.right) match {
      // correlated: head is an alias visible on the left side
      case Some((parts, alias)) if scope.contains(parts.head.toLowerCase) &&
          isCollectionPath(scope(parts.head.toLowerCase), parts.tail) =>
        changed = true
        buildChain(left, scope(parts.head.toLowerCase), parts, alias,
          j.joinType, j.condition)
      // uncorrelated ref joined against something else: expand standalone
      case Some((parts, alias)) if viewType(parts.head).exists(t =>
          isCollectionPath(t, parts.tail)) =>
        val expanded = expandStandalone(parts, alias, outer).get
        j.copy(left = left, right = expanded)
      case _ =>
        j.right match {
          case SubqueryAlias(id, sub)
              if (j.joinType == Inner || j.joinType == Cross) &&
                correlatesWith(sub, scope) =>
            changed = true
            // a subplan joining >= 2 correlated collection refs would
            // plan as two correlated Generates — Spark's decorrelator
            // rejects that; flatten the inner-join tree onto ONE
            // correlated array-materializing Project first
            val flat = tryFlattenMultiRef(sub, scope).getOrElse(sub)
            val sub2 = rewriteNode(flat, scope)
            LateralJoin(left,
              LateralSubquery(SubqueryAlias(id, sub2)), Inner, j.condition)
          case r => j.copy(left = left, right = rewriteNode(r, outer))
        }
    }
  }

  /** Walk `rowType` through STRUCT hops only and return the element
    * type of the FINAL array — None if any intermediate hop is itself
    * a collection (those still need chained correlated Generates) or
    * the path does not end on an array.
    */
  private def structPathArrayElem(rowType: StructType,
      parts: Seq[String]): Option[DataType] = {
    if (parts.isEmpty) return None
    var cur: DataType = rowType
    for (p <- parts) {
      val isLast = p eq parts.last
      cur match {
        case st: StructType => field(st, p) match {
          case None => return None
          case Some(f) => f.dataType match {
            case ArrayType(et, _) =>
              if (isLast) return Some(et) else return None
            case _: MapType => return None
            case other =>
              if (isLast) return None
              cur = other
          }
        }
        case _ => return None
      }
    }
    None
  }

  /** The r12 pinned-limit closure (same-collection subplan self-join):
    * an INNER/CROSS join tree whose leaves are ALL correlated
    * struct-path collection refs rewrites to ONE bottom Project that
    * materializes each outer array into a local attribute
    * (`outer.arr AS __matN` over OneRowRelation — the only correlated
    * operator) with the refs' Generates stacked above it over the
    * LOCAL attributes and every join condition applied as a Filter.
    * Spark's decorrelator accepts a correlated Project under
    * arbitrary Generates (verified: it builds a distinct-array domain
    * and joins back) where it rejects two correlated Generates.
    *
    * LEFT OUTER between two refs (r14, closing the r13 pin): no Join
    * survives the rewrite at all — Generate's `outer = true` IS
    * per-left-element left-outer semantics, so
    * `ca LEFT OUTER JOIN cb ON cond` becomes the same materializing
    * bottom Project + a plain Generate of ca's array + an
    * outer=true Generate of `filter(__matCb, b -> cond')` where
    * cond' rewrites cb-qualified attributes into the lambda variable
    * (ca-qualified ones resolve against the first Generate's output,
    * which is in scope inside a higher-order-function body). An empty
    * match set emits one row with NULL cb columns — exactly the
    * reference SubplanNode's per-row left outer join. Conditions
    * must qualify every column by one of the two ref aliases
    * (unqualified or outer-correlated predicates keep the pin).
    */
  private def tryFlattenMultiRef(sub: LogicalPlan,
      scope: Scope): Option[LogicalPlan] = {
    // ref leaf: (parts, alias, elem type) for a correlated struct-path
    // array ref of an outer alias
    def refLeaf(p: LogicalPlan): Option[(Seq[String], Option[String], DataType)] = {
      val (parts, alias) = p match {
        case u: UnresolvedRelation => (u.multipartIdentifier, None)
        case SubqueryAlias(id, u: UnresolvedRelation) =>
          (u.multipartIdentifier, Some(id.name))
        case _ => return None
      }
      if (parts.length < 2) return None
      scope.get(parts.head.toLowerCase)
        .flatMap(rt => structPathArrayElem(rt, parts.tail))
        .map(et => (parts, alias, et))
    }
    // collect an all-ref inner-join tree; None on any other shape
    def collectTree(p: LogicalPlan):
        Option[(Seq[(Seq[String], Option[String], DataType)], Seq[Expression])] =
      p match {
        case Join(l, r, Inner | Cross, cond, _) =>
          for {
            (lr, lc) <- collectTree(l)
            (rr, rc) <- collectTree(r)
          } yield (lr ++ rr, lc ++ rc ++ cond.toSeq)
        case other => refLeaf(other).map(r => (Seq(r), Nil))
      }
    // outAttrs for one ref's Generate (shared by both join shapes)
    def genAttrs(et: DataType): (Boolean, Seq[Attribute]) = {
      val flatten = et.isInstanceOf[StructType]
      val attrs =
        Seq(AttributeReference("pos", LongType, nullable = true)(),
          AttributeReference("item", et, nullable = true)()) ++
        (if (flatten) et.asInstanceOf[StructType].fields.toSeq.map(sf =>
          AttributeReference(sf.name, sf.dataType, nullable = true)())
         else Nil)
      (flatten, attrs)
    }
    // LEFT OUTER between two refs: materialize both arrays, Generate
    // the left, then an outer=true Generate of filter(right, cond') —
    // see the scaladoc above. None when the condition references
    // anything but the two aliases (the remaining pinned shape).
    def flattenLeftOuter(l: LogicalPlan, r: LogicalPlan,
        cond: Expression): Option[LogicalPlan] = {
      val lRef = refLeaf(l); val rRef = refLeaf(r)
      if (lRef.isEmpty || rRef.isEmpty) return None
      val (lParts, lAlias, lEt) = lRef.get
      val (rParts, rAlias, rEt) = rRef.get
      val ql = lAlias.getOrElse(lParts.last)
      val qr = rAlias.getOrElse(rParts.last)
      if (ql.equalsIgnoreCase(qr)) return None
      if (cond.exists(_.isInstanceOf[SubqueryExpression])) return None
      nextId += 1
      val lam = UnresolvedNamedLambdaVariable(Seq(s"__kb$nextId"))
      var ok = true
      val body = cond.transformUp {
        case ua: UnresolvedAttribute =>
          val parts = ua.nameParts
          if (parts.length >= 2 && parts.head.equalsIgnoreCase(qr)) {
            // `qr.item` IS the element (the UnnestArray column name for
            // primitive elements and the whole-struct ref alike); any
            // remaining path extracts from it
            val tail =
              if (parts(1).equalsIgnoreCase("item")) parts.drop(2)
              else parts.tail
            tail.foldLeft(lam: Expression)((e, f) =>
              org.apache.spark.sql.catalyst.analysis
                .UnresolvedExtractValue(e, Literal(f)))
          }
          else if (parts.length >= 2 && parts.head.equalsIgnoreCase(ql))
            ua
          else { ok = false; ua }
      }
      if (!ok) return None
      changed = true
      nextId += 1; val m1 = s"__mat$nextId"
      nextId += 1; val m2 = s"__mat$nextId"
      val bottom = Project(Seq(
        Alias(UnresolvedAttribute(lParts), m1)(): NamedExpression,
        Alias(UnresolvedAttribute(rParts), m2)(): NamedExpression),
        OneRowRelation())
      val (flatL, attrsL) = genAttrs(lEt)
      val (flatR, attrsR) = genAttrs(rEt)
      val leftGen = Generate(
        UnnestArray(UnresolvedAttribute(Seq(m1)), flatL),
        Nil, outer = false, Some(ql), attrsL, bottom)
      val filtered = org.apache.spark.sql.catalyst.analysis
        .UnresolvedFunction("filter",
          Seq(UnresolvedAttribute(Seq(m2)), LambdaFunction(body, Seq(lam))),
          isDistinct = false)
      Some(Generate(UnnestArray(filtered, flatR),
        Nil, outer = true, Some(qr), attrsR, leftGen))
    }
    // descend through the unary wrappers above the FROM, rebuild in place
    def descend(p: LogicalPlan): Option[LogicalPlan] = p match {
      case pr: Project => descend(pr.child).map(c => pr.copy(child = c))
      case f: Filter => descend(f.child).map(c => f.copy(child = c))
      case a: Aggregate => descend(a.child).map(c => a.copy(child = c))
      case Join(l, r, LeftOuter, Some(cond), _) =>
        flattenLeftOuter(l, r, cond)
      case j: Join => collectTree(j).flatMap { case (refs, conds) =>
        if (refs.length < 2) None
        else {
          changed = true
          val mats = refs.map { case (parts, _, _) =>
            nextId += 1
            (s"__mat$nextId", parts)
          }
          val bottom = Project(mats.map { case (m, parts) =>
            Alias(UnresolvedAttribute(parts), m)(): NamedExpression },
            OneRowRelation())
          var plan: LogicalPlan = bottom
          refs.zip(mats).foreach { case ((parts, alias, et), (m, _)) =>
            val q = alias.getOrElse(parts.last)
            val flatten = et.isInstanceOf[StructType]
            val outAttrs =
              Seq(AttributeReference("pos", LongType, nullable = true)(),
                AttributeReference("item", et, nullable = true)()) ++
              (if (flatten) et.asInstanceOf[StructType].fields.toSeq.map(sf =>
                AttributeReference(sf.name, sf.dataType, nullable = true)())
               else Nil)
            plan = Generate(UnnestArray(UnresolvedAttribute(Seq(m)), flatten),
              Nil, outer = false, Some(q), outAttrs, plan)
          }
          Some(conds.foldLeft(plan)((acc, c) => Filter(c, acc)))
        }
      }
      case _ => None
    }
    descend(sub)
  }

  /** Does this subquery's FROM reference a collection of an outer alias?
    * (The reference plans these as subplans; Spark needs LATERAL.)
    */
  private def correlatesWith(sub: LogicalPlan, scope: Scope): Boolean = {
    def hit(u: UnresolvedRelation): Boolean =
      u.multipartIdentifier.length >= 2 &&
        scope.contains(u.multipartIdentifier.head.toLowerCase) &&
        isCollectionPath(scope(u.multipartIdentifier.head.toLowerCase),
          u.multipartIdentifier.tail)
    // deep: CTE definitions live in innerChildren, refs may also sit in
    // expression subqueries
    def scan(p: LogicalPlan): Boolean =
      p.collectFirst { case u: UnresolvedRelation if hit(u) => u }.nonEmpty ||
      p.collect { case n: LogicalPlan => n }.exists { n =>
        n.innerChildren.exists {
          case lp: LogicalPlan => scan(lp)
          case _ => false
        } ||
        n.expressions.exists(_.collectFirst {
          case sq: SubqueryExpression if scan(sq.plan) => sq
        }.nonEmpty)
      }
    scan(sub)
  }

  /** Uncorrelated `FROM view.path [alias]`, or — inside a lateral
    * subquery — `FROM outer_alias.path [alias]` unnested over one row
    * with the collection resolving as an outer reference.
    */
  private def expandStandalone(parts: Seq[String], alias: Option[String],
      outer: Scope): Option[LogicalPlan] = {
    if (parts.length < 2) return None
    val head = parts.head
    outer.get(head.toLowerCase) match {
      case Some(rowType) if isCollectionPath(rowType, parts.tail) =>
        changed = true
        return Some(buildChain(OneRowRelation(), rowType, parts, alias,
          Inner, None))
      case _ => ()
    }
    viewType(head) match {
      case Some(rowType) if isCollectionPath(rowType, parts.tail) =>
        changed = true
        val base = SubqueryAlias(head, UnresolvedRelation(Seq(head)))
        Some(buildChain(base, rowType, parts, alias, Inner, None))
      case _ => None
    }
  }

  /** Alias -> row type bindings visible from a FROM subtree. */
  private def aliasesOf(p: LogicalPlan): Scope = p match {
    case SubqueryAlias(id, child) =>
      rowTypeOf(child).map(t => Map(id.name.toLowerCase -> t))
        .getOrElse(Map.empty)
    case g: Generate if g.qualifier.isDefined =>
      aliasesOf(g.child) + (g.qualifier.get.toLowerCase ->
        StructType(g.generatorOutput.map(a => StructField(a.name, a.dataType))))
    case j: Join => aliasesOf(j.left) ++ aliasesOf(j.right)
    case lj: LateralJoin => aliasesOf(lj.left)
    case f: Filter => aliasesOf(f.child)
    case u: UnresolvedRelation if u.multipartIdentifier.length == 1 =>
      viewType(u.multipartIdentifier.head)
        .map(t => Map(u.multipartIdentifier.head.toLowerCase -> t))
        .getOrElse(Map.empty)
    case _ => Map.empty
  }

  private def rowTypeOf(child: LogicalPlan): Option[StructType] = child match {
    case u: UnresolvedRelation if u.multipartIdentifier.length == 1 =>
      viewType(u.multipartIdentifier.head)
    case g: Generate if g.qualifier.isDefined =>
      Some(StructType(g.generatorOutput.map(a => StructField(a.name, a.dataType))))
    case _ => None
  }

  /** One entry per name reachable from the current walk position:
    * lowercase name -> (qualified attribute path, type).
    */
  private type Lookup = Map[String, (Seq[String], DataType)]

  private def lookupOf(prefix: Seq[String], st: StructType): Lookup =
    st.fields.map(f =>
      f.name.toLowerCase -> ((prefix :+ f.name, f.dataType))).toMap

  /** Unnest `parts` (head = base alias/view) on top of `base`. Arrays on
    * the path unnest in sequence; only the last collection's columns get
    * public names + the ref's qualifier, intermediates stay hidden.
    */
  private def buildChain(base: LogicalPlan, rowType: StructType,
      parts: Seq[String], alias: Option[String], joinType: JoinType,
      condition: Option[Expression]): LogicalPlan = {

    // anti/semi over a collection ref: no unnest output is visible,
    // the join is just an emptiness test on the collection
    // (StmtRewriter-style: EXISTS over a relative ref).
    if (joinType == LeftAnti || joinType == LeftSemi) {
      val attr = UnresolvedAttribute(parts)
      val sz = Coalesce(Seq(Size(attr, legacySizeOfNull = false), Literal(0)))
      val pred =
        if (joinType == LeftSemi) GreaterThan(sz, Literal(0))
        else EqualTo(sz, Literal(0))
      return Filter(pred, base)
    }

    val outerGen = joinType == LeftOuter

    var plan = base
    var lookup: Lookup = lookupOf(Seq(parts.head), rowType)
    val n = parts.tail.length

    parts.tail.zipWithIndex.foreach { case (p, i) =>
      val isLast = i == n - 1
      val (path, dt) = lookup.getOrElse(p.toLowerCase,
        throw new IllegalStateException(s"unreachable: checked path $parts"))
      dt match {
        case ArrayType(et, _) =>
          nextId += 1
          val public = isLast
          val q = if (public) alias.getOrElse(p) else s"__u$nextId"
          val posName = if (public) "pos" else s"__pos$nextId"
          val itemName = if (public) "item" else s"__item$nextId"
          val flatten = public && et.isInstanceOf[StructType]
          val gen = UnnestArray(UnresolvedAttribute(path), flatten)
          val outAttrs =
            Seq(AttributeReference(posName, LongType, nullable = true)(),
              AttributeReference(itemName, et, nullable = true)()) ++
            (if (flatten) et.asInstanceOf[StructType].fields.toSeq.map(sf =>
              AttributeReference(sf.name, sf.dataType, nullable = true)())
             else Nil)
          plan = Generate(gen, Nil, outerGen, Some(q), outAttrs, plan)
          // next hops see pos/item under their public names, plus the
          // struct item's own fields reachable through the item column
          lookup = Map(
            "pos" -> ((Seq(q, posName), LongType: DataType)),
            "item" -> ((Seq(q, itemName), et))) ++
            (et match {
              case st: StructType =>
                lookupOf(Seq(q, itemName), st)
              case _ => Map.empty[String, (Seq[String], DataType)]
            })
        case mt: MapType =>
          val q = alias.getOrElse(p)
          // struct values flatten their fields into the generator
          // output so `m.field` resolves to the VALUE's field (without
          // this it falls back to Spark's map-by-key extraction when
          // the base column shares the ref's name)
          val flatten = mt.valueType.isInstanceOf[StructType]
          val outAttrs = Seq(
            AttributeReference("key", mt.keyType, nullable = true)(),
            AttributeReference("value", mt.valueType, nullable = true)()) ++
            (if (flatten)
              mt.valueType.asInstanceOf[StructType].fields.toSeq.map(sf =>
                AttributeReference(sf.name, sf.dataType, nullable = true)())
             else Nil)
          plan = Generate(UnnestMap(UnresolvedAttribute(path), flatten),
            Nil, outerGen, Some(q), outAttrs, plan)
          lookup = lookupOf(Seq(q), mapRow(mt)) ++
            (mt.valueType match {
              case st: StructType => lookupOf(Seq(q, "value"), st)
              case _ => Map.empty[String, (Seq[String], DataType)]
            })
        case st: StructType =>
          lookup = lookupOf(path, st)
        case other =>
          throw new IllegalStateException(
            s"unreachable: $p is ${other.simpleString(10)} in checked path $parts")
      }
    }

    condition match {
      case Some(c) => Filter(c, plan)
      case None => plan
    }
  }
}
