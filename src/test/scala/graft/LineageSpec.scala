package graft

import graft.plans.Lineage
import org.scalatest.funsuite.AnyFunSuite

/** Column-lineage parity with PlannerTest/lineage.test: each case ports
  * a reference block's PROJECTION/PREDICATE dependency claims onto the
  * engine schema (the reference's JSON pins exact source/target column
  * sets; the edge-per-scope partitioning is simplified to one predicate
  * edge — documented in plans/Lineage.scala).
  */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lineageOf(q: String): Lineage.Graph =
    Lineage.of(Engine.sql(spark, TestSpark.sf, q))

  test("lineage.test:1-48 — projection through inline views and a union") {
    val g = lineageOf(
      """select * from (
        |  select l_partkey + l_suppkey x from lineitem
        |  union all
        |  select sum(l_orderkey) y from (select l_orderkey from lineitem) v1
        |) v2""".stripMargin)
    assert(g.projections.map(_._1) == Seq("x"))
    assert(g.projections.head._2 ==
      Set("lineitem.l_partkey", "lineitem.l_suppkey", "lineitem.l_orderkey"))
    assert(g.predicates.isEmpty)
  }

  test("lineage.test:49-150 — join/where/group/having/order/window dependencies") {
    val g = lineageOf(
      """select sum(o.o_totalprice) over (partition by c.c_nationkey
        |    order by o.o_orderkey) w,
        |  count(c.c_name) n, o.o_orderstatus
        |from orders o join customer c on o.o_custkey = c.c_custkey
        |where o.o_totalprice > 0 and c.c_acctbal > 0
        |group by o.o_totalprice, c.c_nationkey, o.o_orderkey, c.c_name,
        |  o.o_orderstatus, o.o_orderdate
        |order by o.o_orderdate limit 10""".stripMargin)
    val proj = g.projections.toMap
    assert(proj("w") == Set("orders.o_totalprice"))
    assert(proj("n") == Set("customer.c_name"))
    assert(proj("o_orderstatus") == Set("orders.o_orderstatus"))
    // join keys, WHERE columns, group keys, window partition/order keys
    // and the ORDER BY column are all predicate dependencies
    for (c <- Seq("orders.o_custkey", "customer.c_custkey",
        "orders.o_totalprice", "customer.c_acctbal", "customer.c_nationkey",
        "orders.o_orderkey", "orders.o_orderdate"))
      assert(g.predicates.contains(c), s"$c missing from ${g.predicates}")
  }

  test("count(*) and literals have no projection sources") {
    val g = lineageOf("select count(*) c, 1 one from lineitem")
    val proj = g.projections.toMap
    assert(proj("c") == Set.empty)
    assert(proj("one") == Set.empty)
  }

  test("IN-subquery columns are predicate dependencies") {
    val g = lineageOf(
      """select o_orderkey from orders
        |where o_custkey in (select c_custkey from customer
        |                    where c_acctbal > 100)""".stripMargin)
    assert(g.projections.toMap.apply("o_orderkey") == Set("orders.o_orderkey"))
    for (c <- Seq("orders.o_custkey", "customer.c_custkey",
        "customer.c_acctbal"))
      assert(g.predicates.contains(c), s"$c missing from ${g.predicates}")
  }

  test("explode/lateral outputs trace to the generator's source column") {
    val g = lineageOf(
      "select tok from (select explode(split(text, ' ')) tok from documents)")
    assert(g.projections.toMap.apply("tok") == Set("documents.text"))
  }

  test("the JSON rendering is well-formed and carries the edge sets") {
    val q = "select l_orderkey + l_partkey s from lineitem where l_suppkey > 0"
    val json = lineageOf(q).toJson(q)
    // parse with the JDK-free check: the driver-side tools use python,
    // here structural containment suffices
    assert(json.contains("\"edgeType\":\"PROJECTION\""))
    assert(json.contains("\"edgeType\":\"PREDICATE\""))
    assert(json.contains("\"vertexId\":\"lineitem.l_suppkey\""))
    assert(json.contains("\"vertexId\":\"s\""))
    // every id referenced by an edge resolves to a vertex
    val ids = "\"id\":(\\d+)".r.findAllMatchIn(json).map(_.group(1).toInt).toSet
    val refd = "\\[(\\d+(?:,\\d+)*)\\]".r.findAllMatchIn(json)
      .flatMap(_.group(1).split(",")).map(_.toInt).toSet
    assert(refd.subsetOf(ids), s"dangling ids: ${refd -- ids}")
  }
}
