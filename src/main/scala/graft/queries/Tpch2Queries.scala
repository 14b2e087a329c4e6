package graft.queries

import graft.{Det, Engine, Q}
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second TPC-H batch: q7/q8/q9/q15/q17/q21 adapted to the testdata
  * schema (no partsupp; q2/q11/q16/q20 need it and stay out of scope).
  * Exercises multi-nation self-joins, market-share conditional ratios,
  * agg-of-agg scalar subqueries, correlated-average filters, and the
  * exists/not-exists double-correlation of q21.
  */
object Tpch2Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  // exact-decimal product chain (Det policy, r8 sweep): factors cast to
  // decimal BEFORE multiplying so both engines compute identical exact
  // decimals at any scale factor
  private def volume = dmoney(col("l_extendedprice")) * oneMinus(col("l_discount"))
  private val oVol = s"${oMoney("l_extendedprice")} * ${oOneMinus("l_discount")}"

  val defs: Seq[Q] = Seq(

    // Q7: volume shipping between two nations, by year and direction.
    Q("q7_volume_shipping",
      (s, d) => {
        val li = t(s, d, "lineitem").filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        val n1 = t(s, d, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = t(s, d, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        t(s, d, "supplier")
          .join(li, col("s_suppkey") === col("l_suppkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(dsumx(volume).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(YEAR(l_shipdate) AS INT) AS l_year,
        |  ${oSumX(oVol)} AS revenue
        |FROM supplier
        |JOIN lineitem ON s_suppkey = l_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY n1.n_name, n2.n_name, YEAR(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // Q8: national market share inside a region's market.
    Q("q8_market_share",
      (s, d) => {
        val america = t(s, d, "region").filter(col("r_name") === "AMERICA")
        val nCust = t(s, d, "nation")
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
        val nSupp = t(s, d, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val base = t(s, d, "part").filter(col("p_type") === "ECONOMY")
          .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"))
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
          .join(broadcast(america), col("cn_region") === col("r_regionkey"))
          .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
          .filter(col("o_orderdate").between(
            lit("1996-01-01").cast("timestamp_ntz"),
            lit("1997-12-31").cast("timestamp_ntz")))
        base.groupBy(year(col("o_orderdate")).as("o_year"))
          .agg((dsumx(when(col("supp_nation") === "NATION_3", volume)
              .otherwise(lit(0).cast(DecimalType(18, 4))))
            / dsumx(volume)).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some(s"""SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
        |  ${oSumX(s"CASE WHEN n2.n_name = 'NATION_3' THEN $oVol ELSE CAST(0 AS DECIMAL(18,4)) END")} /
        |  ${oSumX(oVol)} AS mkt_share
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                      AND TIMESTAMP '1997-12-31 00:00:00'
        |GROUP BY YEAR(o_orderdate)
        |ORDER BY o_year""".stripMargin)),

    // Q9: product-type profit by supplier nation and year (no partsupp:
    // profit = discounted revenue).
    Q("q9_product_profit",
      (s, d) => {
        val nat = t(s, d, "nation")
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))
        t(s, d, "part").filter(col("p_name").like("%red%"))
          .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"))
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(nat), col("s_nationkey") === col("nk"))
          .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(dsumx(volume).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""SELECT n_name AS nation,
        |  CAST(YEAR(o_orderdate) AS INT) AS o_year,
        |  ${oSumX(oVol)} AS sum_profit
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, YEAR(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin)),

    // Q15: top supplier(s) by quarterly revenue — agg-of-agg scalar
    // subquery with exact-decimal equality.
    Q("q15_top_supplier",
      (s, d) => {
        val li = t(s, d, "lineitem").filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp_ntz") &&
          // explicit (vacuous) null guard so BOTH consumers of `rev` —
          // the supplier join (which would otherwise INFER
          // isnotnull(l_suppkey) into its copy of the subtree) and the
          // global max — share an identical aggregate subtree, letting
          // AQE exchange reuse materialize the revenue view ONCE
          // (PlannerSpec5 pins it; the reference materializes the
          // shared WITH subtree once per fragment tree)
          col("l_suppkey").isNotNull)
        val rev = li.groupBy(col("l_suppkey"))
          .agg(sum(volume.cast(D28_6)).as("total_rev"))
        val maxRev = rev.agg(max(col("total_rev")).as("mr"))
        t(s, d, "supplier")
          .join(rev, col("s_suppkey") === col("l_suppkey"))
          .crossJoin(broadcast(maxRev))
          .filter(col("total_rev") === col("mr"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""WITH rev AS (
        |  SELECT l_suppkey, SUM(CAST($oVol AS DECIMAL(28,6))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)),

    // Q17: small-quantity-order revenue — correlated per-part average.
    Q("q17_small_quantity",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val partAvg = li.groupBy(col("l_partkey").as("pk"))
          .agg((davg2(col("l_quantity")) * 0.5).as("half_avg_qty"))
        val part = t(s, d, "part").filter(col("p_brand") === "Brand#23")
        li.join(part, col("l_partkey") === col("p_partkey"))
          .join(partAvg, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < col("half_avg_qty"))
          .agg((dsum2(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
      },
      Some(s"""SELECT ${oSum2("l_extendedprice")} / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (
        |    SELECT ${oAvg2("l_quantity")} * 0.5
        |    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin)),

    // Q21: suppliers whose line was the only late one in a multi-supplier
    // order (late = shipped > 60 days after the order date).
    Q("q21_waiting_supplier",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val ord = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        val l1 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"),
            col("o_orderdate").as("odate"))
        val others = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
        // reuse l1's subtree (identical scan+join): Spark's ReuseExchange
        // dedupes the physical work instead of computing late-lines twice
        val othersLate = l1.select(col("okey").as("o3"), col("skey").as("s3"))
        val withOther = l1.join(others,
          col("okey") === col("o2") && col("skey") =!= col("s2"), "left_semi")
        val lonelyLate = withOther.join(othersLate,
          col("okey") === col("o3") && col("skey") =!= col("s3"), "left_anti")
        lonelyLate
          .join(t(s, d, "supplier"), col("skey") === col("s_suppkey"))
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(countDistinct(col("okey")).as("numwait"))
          .orderBy(col("numwait").desc, col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey""".stripMargin))
  )
}
