package graft.queries

import graft.{Engine, Q}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Predicate surface (SURVEY.md section 2.5: like-predicate.cc,
  * in-predicate.h, compound-predicates.cc, operators.cc) and the WITH
  * clause (WithClause.java).
  */
object PredicateQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  val defs: Seq[Q] = Seq(

    // LIKE / NOT LIKE / RLIKE / IN-list / BETWEEN / IS NULL / <=>.
    Q("pred_like_in",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
          col("p_name").like("%gear%").as("has_gear"),
          (!col("p_name").like("s%")).as("not_s"),
          col("p_name").rlike("^(red|blue) ").as("colored"),
          col("p_brand").isin("Brand#11", "Brand#22", "Brand#33").as("in_brands"),
          col("p_size").between(10, 20).as("mid_size"),
          nullif(col("p_type"), lit("PROMO")).isNull.as("is_promo"),
          (col("p_type") <=> lit("PROMO")).as("promo_nullsafe"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, p_name, p_brand, p_size,
        |  p_name LIKE '%gear%' AS has_gear,
        |  p_name NOT LIKE 's%' AS not_s,
        |  REGEXP_MATCHES(p_name, '^(red|blue) ') AS colored,
        |  p_brand IN ('Brand#11','Brand#22','Brand#33') AS in_brands,
        |  p_size BETWEEN 10 AND 20 AS mid_size,
        |  NULLIF(p_type, 'PROMO') IS NULL AS is_promo,
        |  p_type IS NOT DISTINCT FROM 'PROMO' AS promo_nullsafe
        |FROM part ORDER BY p_partkey""".stripMargin)),

    // Compound AND/OR/NOT with three-valued NULL logic.
    Q("pred_compound_null",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("st"))
        .select(col("o_orderkey"),
          (col("st") === "O" || col("st") === "F").as("o_or_f"),
          (col("st") =!= "O" && col("st").isNotNull).as("not_o"),
          (!(col("st") === "O")).as("neg_eq"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        |  (st = 'O' OR st = 'F') AS o_or_f,
        |  (st <> 'O' AND st IS NOT NULL) AS not_o,
        |  NOT (st = 'O') AS neg_eq
        |FROM (SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st
        |      FROM orders) t
        |ORDER BY o_orderkey""".stripMargin)),

    // WITH clause (CTE), reused twice in one query.
    Q("cte_with",
      (s, d) => Engine.sql(s, d,
        """WITH big AS (
          |  SELECT o_custkey, COUNT(*) AS n
          |  FROM orders WHERE o_totalprice > 200000.0
          |  GROUP BY o_custkey)
          |SELECT a.o_custkey, a.n,
          |  CAST(a.n AS DOUBLE) * 100.0 /
          |    CAST((SELECT SUM(n) FROM big) AS DOUBLE) AS pct
          |FROM big a
          |WHERE a.n >= 3
          |ORDER BY a.o_custkey""".stripMargin),
      Some("""WITH big AS (
        |  SELECT o_custkey, COUNT(*) AS n
        |  FROM orders WHERE o_totalprice > 200000.0
        |  GROUP BY o_custkey)
        |SELECT a.o_custkey, a.n,
        |  CAST(a.n AS DOUBLE) * 100.0 /
        |    CAST((SELECT CAST(SUM(n) AS BIGINT) FROM big) AS DOUBLE) AS pct
        |FROM big a
        |WHERE a.n >= 3
        |ORDER BY a.o_custkey""".stripMargin))
  )
}
