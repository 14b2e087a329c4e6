package graft.queries

import graft.{Det, Engine, Q}
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic-function coverage (AnalyticEvalNode, SURVEY.md section 2.4):
  * ranking family, lag/lead, first/last_value, sliding ROWS frames,
  * RANGE unbounded-preceding frames, and a sessionization pipeline over
  * the events table.
  *
  * Every ORDER BY inside a window carries a unique tiebreaker so results
  * are a deterministic set. Running double sums go through decimal casts
  * (DuckDB evaluates moving sums with a segment tree — different
  * association order than Spark's running accumulation — so raw doubles
  * would diverge in the last bits).
  *
  * `events.ts` is epoch-nanos BIGINT on the Spark side (see Engine);
  * the oracle uses epoch_ns(ts).
  */
object WindowQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  val defs: Seq[Q] = Seq(

    // rank / dense_rank / row_number + filter on rank (top-3 per group).
    Q("win_rank",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d, "customer")
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            row_number().over(w).as("rn"))
          .filter(col("rnk") <= 3)
          .orderBy(col("c_mktsegment"), col("rnk"))
      },
      Some("""SELECT * FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(RANK() OVER w AS INT) AS rnk,
        |    CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        |    CAST(ROW_NUMBER() OVER w AS INT) AS rn
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment
        |               ORDER BY c_acctbal DESC, c_custkey)) t
        |WHERE rnk <= 3
        |ORDER BY c_mktsegment, rnk""".stripMargin)),

    // lag / lead over event time per user. Event time is truncated to
    // microseconds on both sides: DuckDB surfaces TIMESTAMP_NS at micro
    // precision, so ordering keys must agree at micro resolution.
    Q("win_lag_lead",
      (s, d) => {
        val tsUs = (col("ts") - col("ts") % 1000).as("ts")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), tsUs, col("value"))
          .select(col("user_id"), col("event_id"), col("ts"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"),
            row_number().over(w).as("seq"))
          .filter(col("user_id") < 5)
      },
      Some("""SELECT user_id, event_id, epoch_ns(ts) AS ts, value,
        |  LAG(value, 1) OVER w AS prev_value,
        |  LEAD(value, 1) OVER w AS next_value,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS seq
        |FROM events
        |WHERE user_id < 5
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)""".stripMargin)),

    // Running total (ROWS UNBOUNDED PRECEDING) + 5-row moving average,
    // decimal-exact.
    Q("win_running",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mov = w.rowsBetween(-4, Window.currentRow)
        t(s, d, "events")
          .withColumn("ts", col("ts") - col("ts") % 1000) // micro-align
          .select(col("user_id"), col("event_id"),
            sum(col("value").cast(D18_2)).over(cum).cast("double").as("running_sum"),
            (sum(col("value").cast(D18_2)).over(mov).cast("double") /
              count(lit(1)).over(mov)).as("moving_avg5"))
          .filter(col("user_id") < 5)
      },
      Some("""SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER cum AS DOUBLE) AS running_sum,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER mov AS DOUBLE)
        |    / COUNT(*) OVER mov AS moving_avg5
        |FROM events
        |WHERE user_id < 5
        |WINDOW cum AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       mov AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // ntile / percent_rank / cume_dist (the reference rewrites these into
    // rank/count arithmetic — AnalyticExpr.java; Spark has them native).
    Q("win_ntile",
      (s, d) => {
        val w = Window.orderBy(col("s_acctbal").desc, col("s_suppkey"))
        t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_acctbal"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"))
      },
      Some("""SELECT s_suppkey, s_acctbal,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM supplier
        |WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)""".stripMargin)),

    // first_value / last_value over an explicit full-partition frame.
    Q("win_first_last",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "customer")
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            first(col("c_custkey")).over(w).as("richest"),
            last(col("c_custkey")).over(w).as("poorest"))
          .filter(col("c_custkey") <= 100)
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
        |  FIRST_VALUE(c_custkey) OVER w AS richest,
        |  LAST_VALUE(c_custkey) OVER w AS poorest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |QUALIFY c_custkey <= 100
        |ORDER BY c_custkey""".stripMargin)),

    // RANGE UNBOUNDED PRECEDING — the only RANGE form the reference
    // supports (analytic-eval-node.h:93-110); peers share the value.
    Q("win_range",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            sum(col("o_totalprice").cast(D18_2)).over(w).cast("double")
              .as("cum_spend"))
          .filter(col("o_custkey") < 50)
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS cum_spend
        |FROM orders
        |WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Gap-based sessionization: lag -> gap flag -> running session id ->
    // per-session aggregation (training-pipeline staple over event logs).
    Q("sessionize",
      (s, d) => {
        val gapNs = 1800L * 1000 * 1000 * 1000 // 30 min in nanos
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val flagged = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            when(col("ts") - lag(col("ts"), 1).over(w) > gapNs ||
              lag(col("ts"), 1).over(w).isNull, 1).otherwise(0).as("new_sess"))
        flagged
          .select(col("user_id"), col("ts"),
            sum(col("new_sess")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("sess_id"))
          .groupBy(col("user_id"))
          .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""WITH flagged AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
        |    CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts), 1) OVER w
        |              > 1800000000000
        |         OR LAG(epoch_ns(ts), 1) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
        |sess AS (
        |  SELECT user_id,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sess_id
        |  FROM flagged)
        |SELECT user_id, MAX(sess_id) AS n_sessions, COUNT(*) AS n_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
