package graft.queries

import graft.{Det, Engine, Q}
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-mode coverage: all of the reference's TJoinOp variants
  * (PlanNodes.thrift:214-232 — INNER, LEFT/RIGHT/FULL OUTER, LEFT SEMI,
  * LEFT ANTI, NULL_AWARE_LEFT_ANTI, CROSS) plus non-equi nested-loop
  * shapes and the broadcast-vs-shuffle distinction.
  */
object JoinQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  val defs: Seq[Q] = Seq(

    // INNER equi-join + agg (shuffled hash / sort-merge on big-big).
    Q("join_inner",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("volume"))
        .orderBy(col("c_mktsegment")),
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  ${oSum2("o_totalprice")} AS volume
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // LEFT OUTER row-level with NULL probe side visible in the output.
    Q("join_left_outer",
      (s, d) => {
        val cust = t(s, d, "customer")
        val bigOrders = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
        cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_big"),
            max(col("o_totalprice")).as("max_big"))
          .filter(col("c_custkey") <= 200)
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_big,
        |  MAX(o_totalprice) AS max_big
        |FROM customer LEFT OUTER JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
        |  ON c_custkey = o_custkey
        |WHERE c_custkey <= 200
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    // RIGHT OUTER (probe/build sides swapped relative to left outer).
    Q("join_right_outer",
      (s, d) => {
        val li = t(s, d, "lineitem").filter(col("l_quantity") >= 49)
        val ord = t(s, d, "orders")
        li.join(ord, col("l_orderkey") === col("o_orderkey"), "right_outer")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("l_orderkey")).as("n_matched"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_rows,
        |  COUNT(l_orderkey) AS n_matched
        |FROM (SELECT * FROM lineitem WHERE l_quantity >= 49) l
        |RIGHT OUTER JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // FULL OUTER with nulls on both sides.
    Q("join_full_outer",
      (s, d) => {
        val c = t(s, d, "customer").filter(col("c_nationkey") < 15)
          .groupBy(col("c_nationkey").as("nk_c"))
          .agg(count(lit(1)).as("n_cust"))
        val su = t(s, d, "supplier").filter(col("s_nationkey") >= 10)
          .groupBy(col("s_nationkey").as("nk_s"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(su, col("nk_c") === col("nk_s"), "full_outer")
          .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT COALESCE(nk_c, nk_s) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk_c, COUNT(*) AS n_cust FROM customer
        |      WHERE c_nationkey < 15 GROUP BY c_nationkey) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nk_s, COUNT(*) AS n_supp FROM supplier
        |      WHERE s_nationkey >= 10 GROUP BY s_nationkey) s
        |ON nk_c = nk_s
        |ORDER BY nationkey""".stripMargin)),

    // LEFT SEMI (EXISTS).
    Q("join_semi",
      (s, d) => {
        val cust = t(s, d, "customer")
        val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_nationkey
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)),

    // LEFT ANTI (NOT EXISTS).
    Q("join_anti",
      (s, d) => {
        val cust = t(s, d, "customer")
        val ord = t(s, d, "orders")
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    // NULL_AWARE_LEFT_ANTI: NOT IN subquery (StmtRewriter.java:524;
    // Spark plans a null-aware anti join). Via the SQL front door so the
    // rewrite itself is exercised.
    Q("join_notin",
      (s, d) => Engine.sql(s, d,
        """SELECT s_suppkey, s_name, s_nationkey
          |FROM supplier
          |WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation
          |                          WHERE n_regionkey = 0)
          |ORDER BY s_suppkey""".stripMargin),
      Some("""SELECT s_suppkey, s_name, s_nationkey
        |FROM supplier
        |WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation
        |                          WHERE n_regionkey = 0)
        |ORDER BY s_suppkey""".stripMargin)),

    // CROSS join (CrossJoinNode / BroadcastNestedLoopJoin).
    Q("join_cross",
      (s, d) => t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin)),

    // Equi-join + non-equi residual conjunct ("other conjuncts" in the
    // reference's hash join, partitioned-hash-join-node.h:60).
    Q("join_band",
      (s, d) => {
        val sup = t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_acctbal"),
            floor(col("s_acctbal") / 1000).cast("bigint").as("band"))
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_acctbal"),
            floor(col("c_acctbal") / 1000).cast("bigint").as("cband"))
        sup.join(cust, col("band") === col("cband") &&
            col("s_acctbal") > col("c_acctbal"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("band"))
      },
      Some("""SELECT CAST(FLOOR(s_acctbal / 1000) AS BIGINT) AS band,
        |  COUNT(*) AS n_pairs
        |FROM supplier JOIN customer
        |  ON CAST(FLOOR(s_acctbal / 1000) AS BIGINT)
        |     = CAST(FLOOR(c_acctbal / 1000) AS BIGINT)
        | AND s_acctbal > c_acctbal
        |GROUP BY CAST(FLOOR(s_acctbal / 1000) AS BIGINT)
        |ORDER BY band""".stripMargin)),

    // Pure non-equi self join — nested-loop (theta) join.
    Q("join_theta_self",
      (s, d) => {
        val n1 = t(s, d, "nation")
          .select(col("n_nationkey").as("a_key"), col("n_name").as("a_name"),
            col("n_regionkey").as("a_region"))
        val n2 = t(s, d, "nation")
          .select(col("n_nationkey").as("b_key"), col("n_name").as("b_name"),
            col("n_regionkey").as("b_region"))
        n1.join(n2, col("a_region") === col("b_region") &&
            col("a_key") < col("b_key"))
          .select(col("a_name"), col("b_name"), col("a_region"))
          .orderBy(col("a_region"), col("a_name"), col("b_name"))
      },
      Some("""SELECT n1.n_name AS a_name, n2.n_name AS b_name,
        |  n1.n_regionkey AS a_region
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_regionkey = n2.n_regionkey
        | AND n1.n_nationkey < n2.n_nationkey
        |ORDER BY a_region, a_name, b_name""".stripMargin))
  )
}
