package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** plans/SemiJoinValueTransfer: literal equivalences cross LeftSemi
  * joins in both directions, never cross anti joins, and never change
  * results (the soundness half of ValueTransferGraph parity).
  */
class SemiJoinValueTransferSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sql(q: String): DataFrame = Engine.sql(spark, TestSpark.sf, q)
  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("subquery literal transfers to the probe scan (build -> probe)") {
    val p = physical(sql(
      """select count(*) from orders o
        |where o.o_custkey in (select c_custkey from customer
        |                      where c_custkey = 7)""".stripMargin))
    assert(p.contains("EqualTo(o_custkey,7)"), p)
  }

  test("probe literal transfers into the subquery scan (probe -> build)") {
    val p = physical(sql(
      """select count(*) from orders o
        |where o.o_custkey = 7
        |  and o.o_custkey in (select c_custkey from customer)""".stripMargin))
    assert(p.contains("EqualTo(c_custkey,7)"), p)
  }

  test("no transfer across NOT IN / anti joins (it would be unsound)") {
    // filtering the probe by the subquery's literal would wrongly DROP
    // rows that should survive the anti join
    val p = physical(sql(
      """select count(*) from orders o
        |where o.o_custkey not in (select c_custkey from customer
        |                          where c_custkey = 7)""".stripMargin))
    val probeScan = p.linesIterator
      .filter(l => l.contains("orders") && l.contains("PushedFilters"))
      .mkString("\n")
    assert(!probeScan.contains("EqualTo(o_custkey,7)"), p)
  }

  test("results are unchanged by the transfer (soundness)") {
    // custkey 7 exists at sf0.001; compare against the de-sugared form
    val viaIn = sql(
      """select count(*) c from orders o
        |where o.o_custkey in (select c_custkey from customer
        |                      where c_custkey = 7)""".stripMargin)
      .head().getLong(0)
    val direct = sql(
      """select count(*) c from orders o
        |where o.o_custkey = 7
        |  and 7 in (select c_custkey from customer)""".stripMargin)
      .head().getLong(0)
    val plain = sql(
      "select count(*) c from orders where o_custkey = 7").head().getLong(0)
    assert(viaIn == direct && viaIn == plain && plain > 0,
      s"viaIn=$viaIn direct=$direct plain=$plain")
  }

  test("transfer survives multi-key conditions and reversed equality order") {
    val p = physical(sql(
      """select count(*) from lineitem l left semi join orders o
        |on o.o_orderkey = l.l_orderkey and o.o_orderkey = 5""".stripMargin))
    assert(p.contains("EqualTo(l_orderkey,5)"), p)
  }

  test("range and IN key predicates transfer, not just equalities") {
    val pr = physical(sql(
      """select count(*) from orders o
        |where o.o_custkey in (select c_custkey from customer
        |                      where c_custkey < 50)""".stripMargin))
    assert(pr.contains("LessThan(o_custkey,50)"), pr)
    val pin = physical(sql(
      """select count(*) from orders o
        |where o.o_custkey in (select c_custkey from customer
        |                      where c_custkey in (3, 5, 9))""".stripMargin))
    assert(pin.contains("In(o_custkey, [3,5,9])") ||
      pin.contains("In(o_custkey"), pin)
    // soundness of the range transfer
    val viaIn = sql(
      """select count(*) c from orders o
        |where o.o_custkey in (select c_custkey from customer
        |                      where c_custkey < 50)""".stripMargin)
      .head().getLong(0)
    val plain = sql(
      "select count(*) c from orders where o_custkey < 50").head().getLong(0)
    assert(viaIn == plain && plain > 0, s"viaIn=$viaIn plain=$plain")
  }
}
