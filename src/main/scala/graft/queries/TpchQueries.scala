package graft.queries

import graft.{Det, Engine, Q}
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-shaped headline queries, adapted to the driver testdata schema
  * (no partsupp table; dates span 1995-2001; p_type/p_brand are synthetic).
  *
  * These mirror the reference's correctness anchors
  * (`testdata/workloads/tpch/queries/tpch-q*.test`) and exercise the core
  * operator pipeline: scan -> filter -> hash join (broadcast + shuffled) ->
  * partial/final aggregation -> sort/top-n. All money aggregates use the
  * decimal-exact Det helpers so the DuckDB oracle hash-matches.
  */
object TpchQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  // exact-decimal product chain (Det policy, r8 sweep): each 2dp factor
  // casts to decimal BEFORE the multiply, so the products are exact and
  // engine-identical at any scale factor (double products cast to
  // decimal hit rounding-tie divergence at ~1e-6/row rates)
  private def discPrice =
    dmoney(col("l_extendedprice")) * oneMinus(col("l_discount"))
  private def charge = discPrice * onePlus(col("l_tax"))
  private val oDisc =
    s"${oMoney("l_extendedprice")} * ${oOneMinus("l_discount")}"
  private val oCharge = s"$oDisc * ${oOnePlus("l_tax")}"

  val defs: Seq[Q] = Seq(

    // Q1: pricing summary report — scan + filter + hash agg + sort.
    Q("q1_pricing",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum2(col("l_quantity")).as("sum_qty"),
            dsum2(col("l_extendedprice")).as("sum_base_price"),
            dsumx(discPrice).as("sum_disc_price"),
            dsumx(charge).as("sum_charge"),
            davg2(col("l_quantity")).as("avg_qty"),
            davg2(col("l_extendedprice")).as("avg_price"),
            davg6(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        |  ${oSum2("l_quantity")} AS sum_qty,
        |  ${oSum2("l_extendedprice")} AS sum_base_price,
        |  ${oSumX(oDisc)} AS sum_disc_price,
        |  ${oSumX(oCharge)} AS sum_charge,
        |  ${oAvg2("l_quantity")} AS avg_qty,
        |  ${oAvg2("l_extendedprice")} AS avg_price,
        |  ${oAvg6("l_discount")} AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Q3: shipping priority — 3-way join + agg + top-n with tiebreaks.
    Q("q3_shipping",
      (s, d) => {
        val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp_ntz"))
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp_ntz"))
        cust.join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(dsumx(discPrice).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  ${oSumX(oDisc)} AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin)),

    // Q4: order priority checking — correlated EXISTS => left semi join.
    Q("q4_order_priority",
      (s, d) => {
        val ord = t(s, d, "orders").filter(
          col("o_orderdate") >= lit("1997-07-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp_ntz"))
        val li = t(s, d, "lineitem")
        ord.join(li,
            ord("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > ord("o_orderdate"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)),

    // Q5: local supplier volume — 6-table join (broadcast dims) + agg.
    Q("q5_local_supplier",
      (s, d) => {
        val cust = t(s, d, "customer")
        val ord = t(s, d, "orders").filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        val li = t(s, d, "lineitem")
        val sup = t(s, d, "supplier")
        val nat = t(s, d, "nation")
        val reg = t(s, d, "region").filter(col("r_name") === "ASIA")
        cust.join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(dsumx(discPrice).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name,
        |  ${oSumX(oDisc)} AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin)),

    // Q6: forecasting revenue change — pure scan+filter+global agg.
    Q("q6_revenue",
      (s, d) => t(s, d, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(dsumx(dmoney(col("l_extendedprice")) * drate(col("l_discount"))).as("revenue")),
      Some(s"""SELECT ${oSumX(s"${oMoney("l_extendedprice")} * ${oRate("l_discount")}")} AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin)),

    // Q10: returned item reporting — 4-way join + agg + top-n.
    Q("q10_returned",
      (s, d) => {
        val cust = t(s, d, "customer")
        val ord = t(s, d, "orders").filter(
          col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp_ntz"))
        val li = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        val nat = t(s, d, "nation")
        cust.join(ord, col("c_custkey") === col("o_custkey"))
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(dsumx(discPrice).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name,
        |  ${oSumX(oDisc)} AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin)),

    // Q12 (adapted: linestatus in place of shipmode) — join + conditional agg.
    Q("q12_priority_class",
      (s, d) => {
        val ord = t(s, d, "orders")
        val li = t(s, d, "lineitem").filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        ord.join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
              .otherwise(0)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
              .otherwise(0)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin)),

    // Q13: customer distribution — left outer join + two-level agg.
    Q("q13_custdist",
      (s, d) => {
        val cust = t(s, d, "customer")
        val ord = t(s, d, "orders")
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // Q14: promotion effect — join + conditional decimal agg, scalar output.
    Q("q14_promo",
      (s, d) => {
        val li = t(s, d, "lineitem").filter(
          col("l_shipdate") >= lit("1997-09-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp_ntz"))
        val part = t(s, d, "part")
        li.join(part, col("l_partkey") === col("p_partkey"))
          .agg((lit(100.0) * (
            dsumx(when(col("p_type") === "PROMO", discPrice)
              .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 4)))) /
            dsumx(discPrice)))
            .as("promo_revenue"))
      },
      Some(s"""SELECT 100.0 * (
        |  ${oSumX(s"CASE WHEN p_type = 'PROMO' THEN $oDisc ELSE CAST(0 AS DECIMAL(18,4)) END")} /
        |  ${oSumX(oDisc)}) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin)),

    // Q18: large volume customers — IN over grouped HAVING => semi join.
    Q("q18_large_orders",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val big = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast(D18_2)).as("sq"))
          .filter(col("sq") > 150)
          .select(col("l_orderkey").as("big_orderkey"))
        val ord = t(s, d, "orders")
        val cust = t(s, d, "customer")
        ord.join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"))
          .agg(dsum2(col("l_quantity")).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some(s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  ${oSum2("l_quantity")} AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin)),

    // Q19: discounted revenue — disjunctive join predicates (OR of bands).
    Q("q19_disjunctive",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val part = t(s, d, "part")
        li.join(part, col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30))))
          .agg(dsumx(discPrice).as("revenue"))
      },
      Some(s"""SELECT ${oSumX(oDisc)} AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // Q22 (adapted): positive-balance customers with no orders, above the
    // global average balance — scalar subquery + anti join + agg.
    Q("q22_global_sales",
      (s, d) => {
        val cust = t(s, d, "customer")
        val ord = t(s, d, "orders")
        val avgBal = cust.filter(col("c_acctbal") > 0.0)
          .agg(davg2(col("c_acctbal")).as("a"))
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("a"))
          .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"), dsum2(col("c_acctbal")).as("totacctbal"))
          .orderBy(col("c_nationkey"))
      },
      Some(s"""SELECT c_nationkey, COUNT(*) AS numcust,
        |  ${oSum2("c_acctbal")} AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT ${oAvg2("c_acctbal")} FROM customer
        |                   WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin))
  )
}
