package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 PlannerTest breadth, part 2: outer-joins.test, joins.test
  * (partition-reuse blocks), with-clause.test, subquery-rewrite.test
  * and aggregation.test claims
  * (`testdata/workloads/functional-planner/queries/PlannerTest/`).
  */
class PlannerSpec4 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sql(q: String): DataFrame = Engine.sql(spark, TestSpark.sf, q)
  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("outer-joins.test:1-27 — ON-clause placement: nullable-side predicate at its scan, preserved-side predicate at the join") {
    // `rhs predicate applied by rhs scan` / `lhs predicate is join
    // predicate`: for a LEFT OUTER, the ON-clause filter on the
    // nullable side prunes before the join, while the preserved-side
    // ON filter may NOT reach the preserved scan (rows failing it
    // still surface null-extended)
    val p = physical(sql(
      """select count(*) from customer c left outer join orders o
        |on c.c_custkey = o.o_custkey
        |   and o.o_orderstatus = 'F'
        |   and c.c_mktsegment = 'BUILDING'""".stripMargin))
    assert(p.contains("LeftOuter"), p)
    assert(p.contains("EqualTo(o_orderstatus,F)"), p)
    assert(!p.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"preserved-side ON predicate leaked into the scan: $p")
  }

  test("outer-joins.test:167-192 — RIGHT OUTER mirrors the placement: left scan filtered, right ON predicate at the join") {
    val p = physical(sql(
      """select count(*) from customer c right outer join orders o
        |on c.c_custkey = o.o_custkey
        |   and c.c_mktsegment = 'BUILDING'
        |   and o.o_orderstatus = 'F'""".stripMargin))
    assert(p.contains("RightOuter"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(!p.contains("EqualTo(o_orderstatus,F)"),
      s"preserved-side ON predicate leaked into the scan: $p")
  }

  test("joins.test:611-776 — a second join on the same key reuses the existing partitioning (no re-exchange)") {
    // the reference's partitioned join exploits the lhs's existing data
    // partition; Spark's EnsureRequirements must equally see that the
    // lower join's output is already hash-partitioned on the key and
    // insert NO exchange between the two joins
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = physical(sql(
        """select count(*) from lineitem l
          |  join orders o on l.l_orderkey = o.o_orderkey
          |  join (select l_orderkey k, count(*) c from lineitem
          |        group by l_orderkey) g on l.l_orderkey = g.k""".stripMargin))
      val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      // one per base input (lineitem, orders, grouped lineitem); the
      // upper join must NOT re-shuffle the lower join's output
      assert(exchanges == 3, s"expected 3 exchanges, got $exchanges:\n$p")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("with-clause.test:187-284 — a WITH view self-join clones the view; its internal filter reaches BOTH scan instances") {
    val df = sql(
      """with v as (select o_orderkey k, o_custkey from orders
        |           where o_orderstatus = 'F')
        |select count(*) from v a join v b on a.k = b.k""".stripMargin)
    val p = physical(df)
    val scans = p.linesIterator.filter(l =>
      l.contains("orders") && l.contains("PushedFilters")).toSeq
    assert(scans.size == 2, s"expected two cloned scans:\n$p")
    scans.foreach(l => assert(l.contains("EqualTo(o_orderstatus,F)"), l))
  }

  test("subquery-rewrite.test:109-135 — multiple WHERE subqueries become multiple joins, never per-row subplans") {
    val p = physical(sql(
      """select count(*) from orders o
        |where o.o_custkey in (select c_custkey from customer)
        |  and o.o_orderkey in (select l_orderkey from lineitem)
        |  and exists (select 1 from nation where n_nationkey = o.o_custkey % 25)"""
        .stripMargin))
    assert(p.linesIterator.count(_.contains("LeftSemi")) == 3, p)
  }

  test("subquery-rewrite.test:33-68 — correlated NOT IN: null-aware anti join carrying BOTH the correlation and the key conjunct") {
    val df = sql(
      """select count(*) from orders o
        |where o.o_orderkey not in (select l_orderkey from lineitem l
        |                           where l.l_suppkey = o.o_custkey)""".stripMargin)
    val p = physical(df)
    assert(p.contains("LeftAnti"), p)
    // both equalities appear in the anti join's condition
    val joinLine = p.linesIterator.find(_.contains("LeftAnti")).getOrElse("")
    assert(joinLine.contains("l_suppkey") && joinLine.contains("l_orderkey"), p)
  }

  test("subquery-rewrite.test:585-602 — correlated NOT EXISTS is a plain anti join") {
    val p = physical(sql(
      """select count(*) from customer c
        |where not exists (select 1 from orders o
        |                  where o.o_custkey = c.c_custkey)""".stripMargin))
    assert(p.contains("LeftAnti"), p)
    assert(!p.toLowerCase.contains("subquery exec"), p)
  }

  test("aggregation.test:82-111 (IMPALA-817) — redundant group-by expressions are removed") {
    val p = physical(sql(
      """select o_custkey, count(*) c from orders
        |group by o_custkey, o_custkey""".stripMargin))
    val keysLine = p.linesIterator
      .find(l => l.contains("HashAggregate") && l.contains("keys="))
      .getOrElse("")
    // exactly one grouping key survives
    assert(keysLine.matches(".*keys=\\[o_custkey[^,\\]]*\\].*"), p)
  }

  test("aggregation.test:152-231 (IMPALA-831) — agg over UNION ALL: one partial pass, one exchange") {
    // the reference merges the union into the distributed agg's first
    // phase; Spark's analog decision is partial HashAggregate above the
    // no-shuffle Union, ONE exchange, final aggregate on top
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = physical(sql(
        """select v % 10 g, count(*) c from (
          |  select o_orderkey v from orders
          |  union all
          |  select l_orderkey v from lineitem) u group by v % 10""".stripMargin))
      assert(p.contains("Union"), p)
      assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
      assert(p.linesIterator.count(_.contains("HashAggregate")) == 2, p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("aggregation.test:495-547 — no aggregation is placed below a limited exchange") {
    // counting a LIMIT subquery must apply the limit first; pushing a
    // partial aggregate below it would count the wrong rows
    val df = sql(
      "select count(*) c from (select * from orders limit 10) v")
    df.collect()
    assert(df.head().getLong(0) == 10L)
    val p = physical(df)
    // the limit operator sits BELOW every aggregate in the plan tree
    val lines = p.linesIterator.toSeq
    val firstAgg = lines.indexWhere(_.contains("HashAggregate"))
    val limitIdx = lines.indexWhere(l =>
      l.contains("GlobalLimit") || l.contains("CollectLimit"))
    assert(firstAgg >= 0 && limitIdx > firstAgg,
      s"limit not below the aggregates:\n$p")
  }

  test("aggregation.test:548-570 — a limit over a non-grouping agg adds no extra exchange") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = physical(sql("select count(*) c from lineitem limit 1"))
      // one single-partition exchange for the merge agg; the limit
      // rides on it rather than adding another shuffle
      assert(p.linesIterator.count(_.contains("Exchange")) == 1, p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
