package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 PlannerTest breadth (r7 verdict #4): systematic translation
  * of the plan-level claims in runtime-filter-propagation.test,
  * join-order.test and predicate-propagation.test
  * (`testdata/workloads/functional-planner/queries/PlannerTest/`) that
  * had no pin yet. Each test names the reference block it ports; the
  * assertion is the planner DECISION that block exists to lock in,
  * expressed against Spark's plan.
  */
class PlannerSpec3 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sql(q: String): DataFrame = Engine.sql(spark, TestSpark.sf, q)
  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // ---- runtime-filter-propagation.test -------------------------------

  test("runtime-filter-propagation.test:122-137 — arithmetic lhs (t1.year + 1 = t2.id) still hash-joins") {
    // the reference targets the runtime filter at the arithmetic expr
    // rather than falling back to a non-hash join; the Spark decision
    // with expression keys is the same: hash join, never NLJ/cartesian
    val p = physical(sql(
      """select count(*) from orders o join customer c
        |on o.o_custkey + 1 = c.c_custkey where c.c_acctbal < 10""".stripMargin))
    assert(p.contains("HashJoin"), p)
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("runtime-filter-propagation.test:138-157 — mixed-slot conjunct becomes a residual, equi part still hashes") {
    // t1.id = t2.id AND t1.a + t2.b = t1.c + t2.d: the second conjunct
    // references both sides so it cannot be a hash key or a runtime
    // filter; the reference keeps it as an other-join-conjunct on the
    // hash join — Spark's ExtractEquiJoinKeys must do the same
    val p = physical(sql(
      """select count(*) from orders o join lineitem l
        |on o.o_orderkey = l.l_orderkey
        |   and o.o_custkey + l.l_partkey = o.o_totalprice + l.l_suppkey"""
        .stripMargin))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("runtime-filter-propagation.test:380-398 — WHERE equi-conjunct across a LEFT OUTER re-enables filtering") {
    // an ON-clause equi predicate of a left outer generates no filter
    // (pinned in PlannerSpec2), but a WHERE-clause equi predicate on
    // the nullable side rejects null-extended rows, so the reference
    // both simplifies the join and generates the filter; Spark's
    // EliminateOuterJoin makes the same call — the join must plan inner
    val df = sql(
      """select count(*) from customer c left outer join orders o
        |on c.c_custkey = o.o_custkey
        |where o.o_totalprice > 0 and c.c_custkey = o.o_custkey""".stripMargin)
    val p = physical(df)
    assert(!p.contains("LeftOuter"), p)
  }

  test("runtime-filter-propagation.test:441-458 — RIGHT OUTER broadcasts the null-producing left, never shuffles the preserved fact") {
    // the reference pushes a runtime filter to the nullable probe side
    // of a right outer join; the Spark shape that keeps the preserved
    // big side un-shuffled is BroadcastHashJoin RightOuter BuildLeft
    val df = sql(
      """select count(*) from nation n right outer join lineitem l
        |on n.n_nationkey = l.l_suppkey % 25""".stripMargin)
    df.collect()
    val p = physical(df)
    assert(p.contains("RightOuter"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the fact side must not range/hash-exchange for this join
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("runtime-filter-propagation.test:463-482 — a semi-join literal equivalence reaches the probe scan") {
    // semi joins generate runtime filters in the reference; the
    // statically-decidable analog is the ValueTransferGraph carrying a
    // literal equivalence through the semi join onto the OUTER scan.
    // Spark alone misses the IN-subquery spelling
    // (RewritePredicateSubquery runs after InferFiltersFromConstraints)
    // — the engine's SemiJoinValueTransfer rule closes that gap, so
    // BOTH spellings must push the literal to the probe scan.
    for (q <- Seq(
      """select count(*) from orders o left semi join customer c
        |on o.o_custkey = c.c_custkey and c.c_custkey = 421""".stripMargin,
      """select count(*) from orders o
        |where o.o_custkey in (select c_custkey from customer
        |                      where c_custkey = 421)""".stripMargin)) {
      val p = physical(sql(q))
      assert(p.contains("EqualTo(c_custkey,421)"), p)
      assert(p.contains("EqualTo(o_custkey,421)"), p)
    }
  }

  test("runtime-filter-propagation.test:489-505 — NOT IN plans a null-aware anti join, not a per-row subplan") {
    val df = sql(
      """select count(*) from nation
        |where n_regionkey not in (select r_regionkey from region
        |                          where r_name = 'EUROPE')""".stripMargin)
    val p = physical(df)
    assert(p.contains("LeftAnti"), p)
    // null-aware: either Spark's NAAJ-capable broadcast hash join or
    // the BNLJ fallback — never a per-row subquery execution
    assert(!p.toLowerCase.contains("subquery exec"), p)
  }

  // ---- join-order.test ------------------------------------------------

  test("join-order.test:195-343 (Q5 shape) — broadcast dim joins apply below the fact-fact merge join") {
    // the reference orders joins so selective dims reduce the fact
    // before the expensive fact-fact join; in Spark the same decision
    // shows as the BroadcastHashJoin sitting INSIDE the SortMergeJoin's
    // input subtree (dims filter lineitem before it meets orders)
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec, ShuffledHashJoinExec}
    val df = sql(
      """select count(*) from lineitem l
        |  join orders o on l.l_orderkey = o.o_orderkey
        |  join supplier s on l.l_suppkey = s.s_suppkey
        |  join nation n on s.s_nationkey = n.n_nationkey
        |where n.n_name = 'FRANCE'""".stripMargin)
    val plan = df.queryExecution.sparkPlan
    val smjs = plan.collect { case j: SortMergeJoinExec => j
                              case j: ShuffledHashJoinExec => j }
    if (smjs.nonEmpty) {
      val bhjUnderSmj = smjs.exists(_.children.exists(
        _.collect { case b: BroadcastHashJoinExec => b }.nonEmpty))
      assert(bhjUnderSmj, plan.toString)
    } else {
      // everything broadcast at this SF — the fact is probe throughout
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.size >= 3,
        plan.toString)
    }
  }

  test("join-order.test:779-830 (IMPALA-860) — inner joins reorder, the outer-join operand boundary holds") {
    // tables left/right of an outer join may reorder internally but not
    // across it; here the filtered inner pair must both broadcast while
    // the outer join survives as LeftOuter on top
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val df = sql(
      """select count(*) from lineitem l
        |  join supplier s on l.l_suppkey = s.s_suppkey
        |  join nation n on s.s_nationkey = n.n_nationkey
        |  left outer join part p on l.l_partkey = p.p_partkey
        |where n.n_name = 'FRANCE'""".stripMargin)
    val p = physical(df)
    assert(p.contains("LeftOuter"), p)
    // the inner group still planned its broadcast dim joins
    assert(df.queryExecution.sparkPlan
      .collect { case b: BroadcastHashJoinExec => b }.size >= 2, p)
    // and part stayed on the outer join's null side: no filter on part
    // may appear (nothing to infer — the outer must not become inner)
    assert(!optimized(df).contains("PushedFilters: [IsNotNull(p_partkey)"), p)
  }

  test("join-order.test:452-523 — the semi join stays a semi join with the big side as its right input") {
    // the reference prevents the largest input from becoming leftmost
    // when a semi join consumes it; Spark keeps the subquery side as
    // the semi join's build/right input — it must never be inverted
    // into the probe position
    val df = sql(
      """select count(*) from nation n
        |where n.n_nationkey in (select l_suppkey % 25 from lineitem)"""
        .stripMargin)
    val p = physical(df)
    assert(p.contains("LeftSemi"), p)
  }

  // ---- predicate-propagation.test ------------------------------------

  test("predicate-propagation.test:21-43 — a predicate on an aggregate expr stays HAVING, never reaches the scan") {
    val df = sql(
      """select * from (
        |  select o_custkey, sum(o_totalprice) t from orders group by o_custkey
        |) v where t > 1000""".stripMargin)
    val p = physical(df)
    // the filter on the agg output sits above the aggregate
    assert(p.contains("HashAggregate"), p)
    // the scan reads o_totalprice (it feeds the SUM) but must push no
    // filter derived from the aggregate's output
    val scanLine = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("PushedFilters: []"),
      s"aggregate-expr predicate leaked into the scan: $scanLine")
  }

  test("predicate-propagation.test:126-181 — no predicate pushes below a LIMIT block") {
    // pushing a filter below a limit changes which rows survive; the
    // reference evaluates c1 > 0 above the limited view, and so must we
    val df = sql(
      """select * from (
        |  select o_orderkey, o_totalprice from orders limit 10
        |) v where o_totalprice > 0""".stripMargin)
    val p = physical(df)
    val scanLine = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(!scanLine.contains("GreaterThan(o_totalprice"),
      s"filter illegally crossed the limit: $p")
    assert(p.contains("GlobalLimit") || p.contains("CollectLimit"), p)
  }

  test("predicate-propagation.test:323-382 — outer-join propagation is one-directional: IS NULL never crosses alone") {
    // a.id IS NULL would hold for every null-extended b-tuple, so the
    // reference refuses to propagate it to b. Spark makes a different
    // but equally-correct call: it derives the CONTRADICTION IsNull AND
    // IsNotNull on the nullable side (no b-row can match a null key),
    // provably emptying the build. The pin: the join must stay outer,
    // and a bare IsNull may never cross WITHOUT its contradicting pair
    // (that would wrongly filter the preserved output)
    val df = sql(
      """select count(*) from customer c left outer join orders o
        |on c.c_custkey = o.o_custkey
        |where c.c_custkey is null""".stripMargin)
    val p = physical(df)
    assert(p.contains("LeftOuter"), p)
    val ordersScan = p.linesIterator
      .filter(l => l.contains("orders") && l.contains("PushedFilters"))
      .mkString("\n")
    if (ordersScan.contains("IsNull(o_custkey)"))
      assert(ordersScan.contains("IsNotNull(o_custkey)"),
        s"bare IS NULL crossed the outer join: $p")
  }

  test("predicate-propagation.test:323-331 — a preserved-side key literal crosses the LEFT OUTER onto the nullable scan") {
    // predicates on a.year ARE propagated to b (one direction): a
    // preserved-side key literal may filter the nullable side because
    // non-matching b-rows only feed null extension
    val p = physical(sql(
      """select count(*) from customer c left outer join orders o
        |on c.c_custkey = o.o_custkey
        |where c.c_custkey = 19""".stripMargin))
    assert(p.contains("EqualTo(c_custkey,19)"), p)
    assert(p.contains("EqualTo(o_custkey,19)"), p)
  }

  test("predicate-propagation.test:563-640 — propagation OUT of a limited block still works") {
    // no propagation INTO a limit block (pinned above), but equivalence
    // derived inside the view flows out: v's internal key literal must
    // reach the outer table's scan
    val p = physical(sql(
      """select count(*) from (
        |  select o_custkey from orders where o_custkey = 11 limit 1000000
        |) v join customer c on v.o_custkey = c.c_custkey""".stripMargin))
    assert(p.contains("EqualTo(o_custkey,11)"), p)
    assert(p.contains("EqualTo(c_custkey,11)"), p)
  }

  test("predicate-propagation.test:1-20 — a cast-wrapped key equivalence still propagates when lossless") {
    // the reference refuses to propagate NON-executable (lossy-cast)
    // predicates; the executable direction must still flow. A bigint
    // key equated to an int key propagates literals both ways
    val p = physical(sql(
      """select count(*) from lineitem l join orders o
        |on l.l_orderkey = o.o_orderkey
        |where o.o_orderkey = cast(7 as int)""".stripMargin))
    assert(p.contains("EqualTo(l_orderkey,7)"), p)
  }
}
