package graft.queries

import graft.{Engine, Q}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nested-type coverage (SURVEY.md sections 1.2 / 2.1 #14-16): the
  * reference reads arbitrarily nested parquet (array/map/struct,
  * hdfs-parquet-scanner.h:56-91) and evaluates per-row collection plans
  * via SubplanNode + UnnestNode. Spark-side: build nested values with
  * collection constructors, navigate with dotted access / element_at,
  * flatten with explode / posexplode (GenerateExec) and lateral views.
  *
  * The flattening round-trips end in flat scalars so the DuckDB oracle can
  * check values (DuckDB's struct literals differ syntactically, so the
  * nested construction itself is checked by ScalaTest instead).
  */
object NestedQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  val defs: Seq[Q] = Seq(

    // Build array<struct> per order (collect_list of struct), then unnest
    // it back (Subplan/Unnest parity) and verify the round trip flattens
    // to the original line items.
    Q("nested_roundtrip",
      (s, d) => {
        val li = t(s, d, "lineitem").filter(col("l_orderkey") < 100)
        val nested = li.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(struct(
            col("l_linenumber").as("ln"),
            col("l_quantity").as("qty")))).as("items"))
        nested
          .select(col("l_orderkey"), explode(col("items")).as("item"))
          .select(col("l_orderkey"), col("item.ln").as("l_linenumber"),
            col("item.qty").as("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Map construction + element_at navigation, flattened for the oracle.
    Q("nested_map_access",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          map(lit("status"), col("o_orderstatus"),
            lit("priority"), col("o_orderpriority")).as("props"))
        .select(col("o_orderkey"),
          element_at(col("props"), "status").as("status"),
          element_at(col("props"), "priority").as("priority"))
        .filter(col("status") === "P")
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_orderstatus AS status,
        |  o_orderpriority AS priority
        |FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_orderkey""".stripMargin)),

    // Deep nesting: struct<array<struct>>, two-level explode (the
    // reference's nested TPC-H shape: orders containing lineitems).
    Q("nested_two_level",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val ord = t(s, d, "orders")
        val orderItems = li.groupBy(col("l_orderkey"))
          .agg(collect_list(struct(col("l_linenumber").as("ln"),
            col("l_extendedprice").as("price"))).as("items"))
        val custOrders = ord.filter(col("o_custkey") < 20)
          .join(orderItems, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(collect_list(struct(col("o_orderkey").as("okey"),
            col("items").as("items"))).as("orders"))
        // two-level unnest back to flat rows, count leaf items per customer
        custOrders
          .select(col("o_custkey"), explode(col("orders")).as("o"))
          .select(col("o_custkey"), col("o.okey").as("o_orderkey"),
            explode(col("o.items")).as("item"))
          .groupBy(col("o_custkey"))
          .agg(countDistinct(col("o_orderkey")).as("n_orders"),
            count(lit(1)).as("n_items"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, COUNT(DISTINCT o_orderkey) AS n_orders,
        |  COUNT(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_custkey < 20
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // Lateral view (SQL front door) over a generated array — the
    // reference's SubplanNode re-opens the unnest per outer row.
    Q("nested_lateral",
      (s, d) => Engine.sql(s, d,
        """SELECT r_name, pos, nk
          |FROM (SELECT r_name, collect_list(n_nationkey) AS nks
          |      FROM region JOIN nation ON r_regionkey = n_regionkey
          |      GROUP BY r_name) g
          |LATERAL VIEW posexplode(sort_array(nks)) t AS pos, nk
          |ORDER BY r_name, pos""".stripMargin),
      Some("""SELECT r_name,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY r_name ORDER BY n_nationkey)
        |       - 1 AS INT) AS pos,
        |  n_nationkey AS nk
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |ORDER BY r_name, pos""".stripMargin)),

    // The reference's nested-types TableRef dialect (CollectionTableRef /
    // SubplanNode, nested-types-scanner-*.test): `FROM t, t.items`
    // correlated unnest with the pos virtual column, rewritten to
    // Generate by plans.NestedTableRefs. The oracle reproduces pos via
    // a window over the same sort the array was built with.
    Q("nested_tableref_unnest",
      (s, d) => {
        Engine.sql(s, d,
          """CREATE OR REPLACE TEMPORARY VIEW lineitem_nested AS
            |SELECT l_orderkey,
            |  sort_array(collect_list(struct(l_linenumber AS ln,
            |    l_quantity AS qty))) AS items
            |FROM lineitem WHERE l_orderkey < 200
            |GROUP BY l_orderkey""".stripMargin)
        Engine.sql(s, d,
          """SELECT l_orderkey, pos, ln, qty
            |FROM lineitem_nested t, t.items
            |ORDER BY l_orderkey, ln""".stripMargin)
      },
      Some("""SELECT l_orderkey,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_quantity) - 1 AS BIGINT) AS pos,
        |  l_linenumber AS ln, l_quantity AS qty
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, ln""".stripMargin)),

    // Subplan aggregate over a correlated collection
    // (`FROM t, (SELECT agg FROM t.items) v`, nested-types-subplan.test
    // shape): decorrelates to an ordinary aggregate + join.
    Q("nested_tableref_subplan",
      (s, d) => {
        Engine.sql(s, d,
          """CREATE OR REPLACE TEMPORARY VIEW cust_order_prices AS
            |SELECT o_custkey, collect_list(o_totalprice) AS prices
            |FROM orders GROUP BY o_custkey""".stripMargin)
        Engine.sql(s, d,
          """SELECT o_custkey, cnt, mx
            |FROM cust_order_prices t,
            |  (SELECT count(item) AS cnt, max(item) AS mx FROM t.prices) v
            |ORDER BY o_custkey""".stripMargin)
      },
      Some("""SELECT o_custkey, CAST(COUNT(o_totalprice) AS BIGINT) AS cnt,
        |  MAX(o_totalprice) AS mx
        |FROM orders GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin)),

    // LEFT ANTI JOIN on a relative collection ref = emptiness test
    // (nested-types-subplan.test "left anti join c.c_orders").
    Q("nested_tableref_anti",
      (s, d) => {
        Engine.sql(s, d,
          """CREATE OR REPLACE TEMPORARY VIEW cust_orderkeys AS
            |SELECT c_custkey, collect_list(o.o_orderkey) AS oks
            |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            |  AND o.o_totalprice > 300000
            |GROUP BY c_custkey""".stripMargin)
        Engine.sql(s, d,
          """SELECT c_custkey FROM cust_orderkeys t
            |LEFT ANTI JOIN t.oks
            |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin))
  )
}
