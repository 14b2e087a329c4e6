package graft.queries

import graft.{Engine, Q}
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Final TPC-H batch: q2/q11/q16/q20, previously blocked on the missing
  * `partsupp` table. `partsupp` is DERIVED deterministically from the
  * driver's part/supplier tables (4 suppliers per part by modular key
  * arithmetic, quantities/costs as integer formulas) — the identical CTE
  * runs in the DuckDB oracle, so every query is hash-checked end to end.
  * All four exercise plan shapes the rest of the suite doesn't: q2's
  * correlated min over a shared derived relation, q11's HAVING against a
  * global scalar, q16's NOT IN + multi-key COUNT DISTINCT, q20's nested
  * IN with a correlated half-sum.
  */
object Tpch3Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  /** Derived partsupp: for each part, 4 suppliers at
    * ((p_partkey*7 + i*3) mod supplier_count) + 1 with formula-generated
    * availqty/supplycost. Pure integer arithmetic + one division by a
    * constant — bit-identical across engines. The supplier count enters
    * as a broadcast scalar (one row), so the derivation is a single
    * map-side pass over part at any scale.
    */
  private def partsupp(s: SparkSession, d: String): DataFrame = {
    val supCnt = t(s, d, "supplier").agg(count(lit(1)).as("sup_cnt"))
    t(s, d, "part").select(col("p_partkey"))
      .crossJoin(broadcast(supCnt))
      .select(col("p_partkey"), col("sup_cnt"),
        explode(sequence(lit(0L), lit(3L))).as("i"))
      .select(
        col("p_partkey").as("ps_partkey"),
        (((col("p_partkey") * 7 + col("i") * 3) % col("sup_cnt")) + 1)
          .as("ps_suppkey"),
        (((col("p_partkey") * 31 + col("i") * 17) % 9999) + 1)
          .as("ps_availqty"),
        (((col("p_partkey") * 13 + col("i") * 11) % 90000).cast("double")
          / 100.0 + 100.0).as("ps_supplycost"))
  }

  /** The identical derivation as a SQL CTE for the oracle. */
  private val oraclePs =
    """ps AS (
      |  SELECT p_partkey AS ps_partkey,
      |    ((p_partkey * 7 + i.i * 3) % sc.c) + 1 AS ps_suppkey,
      |    ((p_partkey * 31 + i.i * 17) % 9999) + 1 AS ps_availqty,
      |    CAST((p_partkey * 13 + i.i * 11) % 90000 AS DOUBLE) / 100.0
      |      + 100.0 AS ps_supplycost
      |  FROM part, (SELECT COUNT(*) AS c FROM supplier) sc,
      |       (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)) i(i)
      |)""".stripMargin

  val defs: Seq[Q] = Seq(

    // Q2: minimum-cost supplier per EUROPE part of size 15.
    Q("q2_min_cost_supplier",
      (s, d) => {
        val ps = partsupp(s, d)
        val supGeo = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")
              .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
        val euroPs = ps.join(supGeo, col("ps_suppkey") === col("s_suppkey"))
        val minCost = euroPs.groupBy(col("ps_partkey").as("mc_partkey"))
          .agg(min(col("ps_supplycost")).as("min_cost"))
        euroPs
          .join(minCost, col("ps_partkey") === col("mc_partkey") &&
            col("ps_supplycost") === col("min_cost"))
          .join(t(s, d, "part").filter(col("p_size") === 15),
            col("ps_partkey") === col("p_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_brand"), col("ps_supplycost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(20)
      },
      Some(s"""WITH $oraclePs
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
        |FROM ps
        |JOIN supplier ON ps_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |JOIN part ON ps_partkey = p_partkey AND p_size = 15
        |WHERE ps_supplycost = (
        |  SELECT MIN(ps2.ps_supplycost)
        |  FROM ps ps2
        |  JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
        |  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        |    AND r2.r_name = 'EUROPE'
        |  WHERE ps2.ps_partkey = ps.ps_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 20""".stripMargin)),

    // Q11: important stock per part in one nation, HAVING vs a global
    // scalar fraction.
    Q("q11_important_stock",
      (s, d) => {
        val ps = partsupp(s, d)
        val natPs = ps
          .join(t(s, d, "supplier"), col("ps_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")
              .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
        // the global threshold is the sum of the per-part group sums
        // (decimal sums — exact, association-free), so BOTH consumers
        // derive from ONE aggregate subtree and AQE exchange reuse
        // materializes the 3-way join once (PlannerSpec5 pins it; the
        // earlier separate natPs.agg threshold computed the join twice)
        val values = natPs.groupBy(col("ps_partkey"))
          .agg(dsum2(col("ps_supplycost") * col("ps_availqty")).as("value"))
        val threshold = values
          .agg((sum(col("value")) * lit(0.0001)).as("thr"))
        values
          .crossJoin(broadcast(threshold))
          .filter(col("value") > col("thr"))
          .select(col("ps_partkey"), col("value"))
          .orderBy(col("value").desc, col("ps_partkey"))
          .limit(100)
      },
      Some(s"""WITH $oraclePs
        |SELECT ps_partkey, ${oSum2("ps_supplycost * ps_availqty")} AS value
        |FROM ps
        |JOIN supplier ON ps_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |GROUP BY ps_partkey
        |HAVING ${oSum2("ps_supplycost * ps_availqty")} > (
        |  SELECT ${oSum2("ps_supplycost * ps_availqty")} * 0.0001
        |  FROM ps
        |  JOIN supplier ON ps_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3')
        |ORDER BY value DESC, ps_partkey
        |LIMIT 100""".stripMargin)),

    // Q16: supplier counts by brand/type/size, excluding one brand, a
    // type prefix, and a NOT IN supplier set.
    Q("q16_parts_supplier_cnt",
      (s, d) => {
        val ps = partsupp(s, d)
        val excluded = t(s, d, "supplier")
          .filter(col("s_suppkey") % 10 === 0)
          .select(col("s_suppkey"))
        ps.join(t(s, d, "part"), col("ps_partkey") === col("p_partkey"))
          .filter(col("p_brand") =!= "Brand#13" &&
            !col("p_type").startsWith("PROMO") &&
            col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
          .join(excluded, col("ps_suppkey") === col("s_suppkey"),
            "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some(s"""WITH $oraclePs
        |SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON ps_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
        |  AND ps_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // Q20: suppliers in one nation holding surplus stock of 'bolt' parts
    // (availqty > half the 1996 shipped quantity of that part+supplier).
    Q("q20_surplus_suppliers",
      (s, d) => {
        val ps = partsupp(s, d)
        val boltParts = t(s, d, "part")
          .filter(col("p_name").contains("bolt"))
          .select(col("p_partkey"))
        // surplus relative to the part's total 1996 shipped quantity (the
        // derived suppkeys don't coincide with lineitem's supplier
        // assignment, so the correlation is per part — same plan shape)
        val shipped = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_quantity")).as("qty"))
        val surplus = ps
          .join(boltParts, col("ps_partkey") === col("p_partkey"), "left_semi")
          .join(shipped, col("ps_partkey") === col("l_partkey"))
          .filter(col("ps_availqty") > col("qty") * 0.5)
          .select(col("ps_suppkey")).distinct()
        t(s, d, "supplier")
          .join(surplus, col("s_suppkey") === col("ps_suppkey"), "left_semi")
          .join(broadcast(t(s, d, "nation")
              .filter(col("n_name") === "NATION_1")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_name"), col("s_suppkey"))
          .orderBy(col("s_name"))
      },
      Some(s"""WITH $oraclePs
        |SELECT s_name, s_suppkey
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
        |WHERE s_suppkey IN (
        |  SELECT ps_suppkey FROM ps
        |  JOIN (SELECT l_partkey, SUM(l_quantity) AS qty
        |        FROM lineitem
        |        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |        GROUP BY l_partkey) sh
        |    ON ps_partkey = sh.l_partkey
        |  WHERE ps_availqty > sh.qty * 0.5
        |    AND ps_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'))
        |ORDER BY s_name""".stripMargin))
  )
}
