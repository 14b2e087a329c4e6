package graft.queries

import graft.{Det, Engine, Q}
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operator-inventory coverage for SURVEY.md section 2.1/2.3/2.5: scans,
  * filters, aggregation modes, distinct, sorts/top-n/offset, union,
  * values, subqueries, explode (Subplan/Unnest parity), and the scalar
  * function surface — each with a DuckDB oracle.
  */
object RelationalQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = {
    Engine.configure(s)
    Engine.table(s, d, n)
  }

  val defs: Seq[Q] = Seq(

    // Scan + conjunct filter + projection (HdfsScanNode + SelectNode:
    // filters and the 3-column projection reach the parquet reader).
    Q("scan_filter",
      (s, d) => t(s, d, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-03-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp_ntz") &&
          col("l_quantity") > 45 && col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_shipdate")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND l_quantity > 45 AND l_returnflag = 'A'""".stripMargin)),

    // LIMIT 0 — EmptySetNode / PropagateEmptyRelation.
    Q("limit_zero",
      (s, d) => t(s, d, "nation").select(col("n_nationkey"), col("n_name")).limit(0),
      Some("SELECT n_nationkey, n_name FROM nation LIMIT 0")),

    // SELECT DISTINCT — aggregation without aggregates.
    Q("distinct_proj",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Non-grouping aggregation — single-tuple output path.
    Q("agg_global",
      (s, d) => t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        dsum2(col("l_extendedprice")).as("sum_price")),
      Some(s"""SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
        |  ${oSum2("l_extendedprice")} AS sum_price
        |FROM lineitem""".stripMargin)),

    // DISTINCT aggregates — the 2-phase distinct-agg rewrite
    // (AggregateInfo.java:40-61 / RewriteDistinctAggregates).
    Q("agg_distinct",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          sum_distinct(col("l_quantity").cast(D18_2)).cast("double").as("sum_uq"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part,
        |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_uq,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // GROUP BY + HAVING on an exact decimal sum.
    Q("agg_having",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(dsum2(col("l_quantity")).as("total_qty"), count(lit(1)).as("n"))
        .filter(col("total_qty") > 1000.0)
        .orderBy(col("l_suppkey")),
      Some(s"""SELECT l_suppkey, ${oSum2("l_quantity")} AS total_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_suppkey
        |HAVING ${oSum2("l_quantity")} > 1000.0
        |ORDER BY l_suppkey""".stripMargin)),

    // Variance/stddev with a deterministic sum-of-squares formulation
    // (Knuth online variance in the reference, aggregate-functions.h:186-203;
    // here decimal-exact moments so the oracle hash-matches).
    Q("agg_stats",
      (s, d) => {
        val qty = col("l_quantity")
        t(s, d, "lineitem").groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            dsum2(qty).as("s1"),
            dsum6(qty * qty).as("s2"))
          .select(col("l_returnflag"), col("n"),
            ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - lit(1)))
              .as("var_samp_qty"),
            sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - lit(1)))
              .as("stddev_samp_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, n,
        |  (s2 - s1 * s1 / n) / (n - 1) AS var_samp_qty,
        |  SQRT((s2 - s1 * s1 / n) / (n - 1)) AS stddev_samp_qty
        |FROM (SELECT l_returnflag, COUNT(*) AS n,
        |        ${oSum2("l_quantity")} AS s1,
        |        ${oSum6("l_quantity * l_quantity")} AS s2
        |      FROM lineitem GROUP BY l_returnflag) m
        |ORDER BY l_returnflag""".stripMargin)),

    // group_concat with deterministic ordering (sorted collect).
    Q("agg_group_concat",
      (s, d) => t(s, d, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"))
        .orderBy(col("n_regionkey")),
      Some("""SELECT n_regionkey,
        |  STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // Conditional aggregation (manual pivot).
    Q("agg_case_pivot",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_done"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_part"),
          dsum2(when(col("o_orderstatus") === "O", col("o_totalprice"))
            .otherwise(lit(0.0))).as("open_value"))
        .orderBy(col("o_orderpriority")),
      Some(s"""SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_done,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_part,
        |  ${oSum2("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END")} AS open_value
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // UNION ALL — passthrough union (UnionNode).
    Q("union_all",
      (s, d) => {
        val c = t(s, d, "customer").select(lit("customer").as("kind"),
          col("c_custkey").as("key"), col("c_acctbal").as("acctbal"))
        val su = t(s, d, "supplier").select(lit("supplier").as("kind"),
          col("s_suppkey").as("key"), col("s_acctbal").as("acctbal"))
        c.union(su).groupBy(col("kind"))
          .agg(count(lit(1)).as("n"), dsum2(col("acctbal")).as("total_bal"))
          .orderBy(col("kind"))
      },
      Some(s"""SELECT kind, COUNT(*) AS n, ${oSum2("acctbal")} AS total_bal
        |FROM (SELECT 'customer' AS kind, c_custkey AS key, c_acctbal AS acctbal
        |      FROM customer
        |      UNION ALL
        |      SELECT 'supplier' AS kind, s_suppkey AS key, s_acctbal AS acctbal
        |      FROM supplier) u
        |GROUP BY kind ORDER BY kind""".stripMargin)),

    // UNION DISTINCT — union + dedup aggregation on top.
    Q("union_distinct",
      (s, d) => {
        val c = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        val su = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
        c.union(su).distinct().orderBy(col("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin)),

    // VALUES / constant select (ValuesStmt.java; UnionNode const exprs).
    Q("const_values",
      (s, d) => {
        Engine.register(s, d)
        s.sql("""SELECT k, v, k * 10 AS v10
          |FROM VALUES (1, 'one'), (2, 'two'), (3, 'three') AS t(k, v)
          |ORDER BY k""".stripMargin)
      },
      Some("""SELECT k, v, k * 10 AS v10
        |FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) t(k, v)
        |ORDER BY k""".stripMargin)),

    // ORDER BY + LIMIT — TopN (TakeOrderedAndProject).
    Q("topn_orders",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25),
      Some("""SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin)),

    // ORDER BY + LIMIT + OFFSET (LimitElement.java offset support).
    Q("sort_offset",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(10).limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10""".stripMargin)),

    // NULLS LAST ordering — Impala's ASC default (SortInfo.java); Spark's
    // ASC default is NULLS FIRST so the engine must inject asc_nulls_last.
    Q("sort_nulls_last",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"))
        .orderBy(col("status_or_null").asc_nulls_last, col("o_orderkey"))
        .limit(50),
      Some("""SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null
        |FROM orders
        |ORDER BY status_or_null ASC NULLS LAST, o_orderkey LIMIT 50""".stripMargin)),

    // Uncorrelated scalar subquery (StmtRewriter: scalar -> cross join).
    Q("subq_scalar",
      (s, d) => {
        val ord = t(s, d, "orders")
        val avgPrice = ord.agg(davg2(col("o_totalprice")).as("a"))
        ord.crossJoin(broadcast(avgPrice))
          .filter(col("o_totalprice") > col("a"))
          .agg(count(lit(1)).as("n_above"),
            dsum2(col("o_totalprice")).as("sum_above"))
      },
      Some(s"""SELECT COUNT(*) AS n_above, ${oSum2("o_totalprice")} AS sum_above
        |FROM orders
        |WHERE o_totalprice > (SELECT ${oAvg2("o_totalprice")} FROM orders)""".stripMargin)),

    // Correlated scalar subquery (per-nation average).
    Q("subq_correlated",
      (s, d) => {
        val cust = t(s, d, "customer")
        val natAvg = cust.groupBy(col("c_nationkey").as("nk"))
          .agg(davg2(col("c_acctbal")).as("nation_avg"))
        cust.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
          .filter(col("c_acctbal") > col("nation_avg"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_above_avg"))
          .orderBy(col("c_nationkey"))
      },
      Some(s"""SELECT c_nationkey, COUNT(*) AS n_above_avg
        |FROM customer c1
        |WHERE c_acctbal > (SELECT ${oAvg2("c_acctbal")} FROM customer c2
        |                   WHERE c2.c_nationkey = c1.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // IN over an uncorrelated subquery list.
    Q("subq_in",
      (s, d) => {
        Engine.register(s, d)
        s.sql("""SELECT p_brand, COUNT(*) AS n_parts
          |FROM part
          |WHERE p_size IN (SELECT DISTINCT p_size FROM part WHERE p_type = 'PROMO')
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
      },
      Some("""SELECT p_brand, COUNT(*) AS n_parts
        |FROM part
        |WHERE p_size IN (SELECT DISTINCT p_size FROM part WHERE p_type = 'PROMO')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // String function surface (string-functions.cc parity, common subset).
    Q("string_funcs",
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 5).as("sub5"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        reverse(col("p_name")).as("rev"),
        trim(col("p_name")).as("trimmed"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        instr(col("p_name"), "e").cast("int").as("pos_e"),
        split(col("p_name"), " ").getItem(0).as("first_word")),
      Some("""SELECT p_partkey,
        |  UPPER(p_name) AS up, LOWER(p_brand) AS lo,
        |  CAST(LENGTH(p_name) AS INT) AS len,
        |  SUBSTR(p_name, 1, 5) AS sub5,
        |  CONCAT_WS('-', p_brand, p_type) AS brand_type,
        |  LPAD(p_brand, 12, '*') AS padded,
        |  REVERSE(p_name) AS rev,
        |  TRIM(p_name) AS trimmed,
        |  REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  CAST(INSTR(p_name, 'e') AS INT) AS pos_e,
        |  STRING_SPLIT(p_name, ' ')[1] AS first_word
        |FROM part""".stripMargin)),

    // Timestamp function surface (timestamp-functions.cc parity subset).
    Q("date_funcs",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        (dayofweek(col("o_orderdate"))).as("dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
        datediff(lit("2000-01-01").cast("timestamp_ntz"), col("o_orderdate"))
          .as("days_to_2000"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt")),
      Some("""SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS INT) AS y,
        |  CAST(MONTH(o_orderdate) AS INT) AS m,
        |  CAST(DAY(o_orderdate) AS INT) AS dom,
        |  CAST(QUARTER(o_orderdate) AS INT) AS q,
        |  CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow,
        |  DATE_TRUNC('month', o_orderdate) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS plus30,
        |  CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INT)
        |    AS days_to_2000,
        |  STRFTIME(o_orderdate, '%Y-%m-%d') AS fmt
        |FROM orders""".stripMargin)),

    // Conditional functions (conditional-functions.h:31 parity subset).
    Q("conditional_funcs",
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("rich").as("bal_class"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(bldg)"))
          .as("seg_or_default"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor0"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap1000")),
      Some("""SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debt'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'rich' END AS bal_class,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(bldg)') AS seg_or_default,
        |  GREATEST(c_acctbal, 0.0) AS bal_floor0,
        |  LEAST(c_acctbal, 1000.0) AS bal_cap1000
        |FROM customer""".stripMargin)),

    // JSON extraction over the events props column.
    Q("json_extract",
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") > 90),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INT) AS k
        |FROM events WHERE CAST(props->>'$.k' AS INT) > 90""".stripMargin)),

    // posexplode over the embedding array (UnnestNode parity) + exact
    // decimal reduction back per vector.
    Q("explode_norms",
      (s, d) => {
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("idx", "v")))
        e.select(col("vec_id"), col("v").cast("double").as("v"))
          .groupBy(col("vec_id"))
          .agg(count(lit(1)).as("n_dims"),
            dsum10(col("v") * col("v")).as("sq_norm"))
          .orderBy(col("vec_id"))
      },
      Some(s"""SELECT vec_id, COUNT(*) AS n_dims,
        |  ${oSum10("v * v")} AS sq_norm
        |FROM (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS v
        |      FROM embeddings) t
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // explode of split tokens + top-k by frequency.
    Q("explode_tokens",
      (s, d) => t(s, d, "documents")
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50),
      Some("""SELECT token, COUNT(*) AS n
        |FROM (SELECT UNNEST(STRING_SPLIT_REGEX(text, '\s+')) AS token
        |      FROM documents) t
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin)),

    // ndv parity (aggregate-functions.h:170-184): DuckDB can't run the
    // Impala HLL-1024 formula, so the oracle checks the exact distinct
    // counts plus booleans asserting both estimators (the exact-formula
    // ndv_hll and Spark's HLL++-backed ndv) land within the sketch's
    // error envelope. Both sketches are deterministic functions of the
    // value SET (bucket-wise max merges), so the booleans are hash-stable;
    // a drifting estimate flips a boolean and fails the gate.
    Q("agg_ndv",
      (s, d) => {
        val li = t(s, d, "lineitem")
        def ok(est: org.apache.spark.sql.Column,
            exact: org.apache.spark.sql.Column) =
          abs(est.cast("double") / exact.cast("double") - 1.0) <= lit(0.15)
        li.agg(
            countDistinct(col("l_partkey")).as("exact_part"),
            countDistinct(col("l_suppkey")).as("exact_supp"),
            expr("ndv_hll(l_partkey)").as("hll_part"),
            expr("ndv_hll(l_suppkey)").as("hll_supp"),
            expr("ndv(l_partkey)").as("ndvpp_part"),
            // FM needs n >> nmaps (64): check it on the widest key so the
            // tolerance holds at every SF (l_partkey at sf0.001 is ~200
            // distinct = FM's known small-n bias regime)
            countDistinct(col("l_orderkey")).as("exact_okey"),
            expr("distinctpc(l_orderkey)").as("pc_okey"),
            expr("distinctpcsa(l_orderkey)").as("pcsa_okey"))
          .select(
            col("exact_part"), col("exact_supp"),
            ok(col("hll_part"), col("exact_part")).as("hll_part_ok"),
            ok(col("hll_supp"), col("exact_supp")).as("hll_supp_ok"),
            ok(col("ndvpp_part"), col("exact_part")).as("ndvpp_part_ok"),
            // FM-over-CRC is reference-exact but inherently coarse (the
            // reference's own corpus pins distinctpc(int_col)=20 against
            // an exact NDV of 957, distinct-estimate.test): assert
            // magnitude (within 4x), not tolerance
            (col("pc_okey").cast("double") * 4 >= col("exact_okey") &&
              col("pc_okey") <= col("exact_okey") * 4)
              .as("pc_okey_ok"),
            (col("pcsa_okey").cast("double") * 4 >= col("exact_okey") &&
              col("pcsa_okey") <= col("exact_okey") * 4)
              .as("pcsa_okey_ok"))
      },
      Some("""SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_part,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supp,
        |  TRUE AS hll_part_ok, TRUE AS hll_supp_ok, TRUE AS ndvpp_part_ok,
        |  TRUE AS pc_okey_ok, TRUE AS pcsa_okey_ok
        |FROM lineitem""".stripMargin)),

    // appx_median over STRING and INT inputs (AppxMedianFinalize takes
    // samples[n/2] after a memcmp/numeric sort; the documents table is
    // under the 20k reservoir cap at every SF, so the result is the
    // EXACT rank-floor(n/2) element and DuckDB can reproduce it with a
    // row_number over the sorted group).
    // histogram() is exact below the 20k reservoir cap (the full
    // sorted sample IS the state), so the equi-height boundary string
    // — sorted[(b+1)*spb - 1] per bucket, HistogramFinalize's exact
    // arithmetic — is deterministic and DuckDB-mirrorable over an
    // integer column. The input is a deterministic 15k-row prefix
    // (ORDER BY the unique key + LIMIT) so the exactness claim holds
    // at EVERY SF, not just below the cap's row count.
    Q("agg_histogram",
      (s, d) => {
        Engine.configure(s)
        Engine.register(s, d)
        s.sql("""select histogram(o_custkey) as hist from
          |(select o_custkey from orders order by o_orderkey limit 15000) o
          |""".stripMargin)
      },
      Some("""WITH base AS (SELECT o_custkey FROM orders
        |    ORDER BY o_orderkey LIMIT 15000),
        |o AS (SELECT o_custkey v,
        |    ROW_NUMBER() OVER (ORDER BY o_custkey) rn,
        |    COUNT(*) OVER () n FROM base)
        |SELECT STRING_AGG(CAST(v AS VARCHAR), ', ' ORDER BY rn) AS hist
        |FROM o WHERE rn % GREATEST(n // 100, 1) = 0
        |  AND rn / GREATEST(n // 100, 1) <= LEAST(n, 100)""".stripMargin)),
    // sample() emits its reservoir in arrival order (unspecified, as in
    // the reference); below the cap the CONTENT is the full column, so
    // sorting the rendered list makes the collection semantics
    // driver-checkable without constraining the order the agg emits.
    // Fed a deterministic 15k prefix (agg_histogram's recipe) so the
    // exactness claim is SF-proof — the r8 10x sweep caught the full
    // column exceeding the 20k cap and degrading to a true sample.
    Q("agg_sample",
      (s, d) => {
        Engine.configure(s)
        Engine.register(s, d)
        s.sql("""select array_join(array_sort(split(sample(lang), ', ')), ', ')
          |  as langs from
          |(select lang from documents order by doc_id limit 15000) d
          |""".stripMargin)
      },
      Some("""SELECT STRING_AGG(lang, ', ' ORDER BY lang) AS langs FROM
        |(SELECT lang FROM documents ORDER BY doc_id LIMIT 15000) d"""
        .stripMargin)),
    // Fed the deterministic 15k prefix so every per-source group stays
    // under the 20k reservoir cap (exact median) at EVERY SF — the r8
    // sweep showed the full column passes at 10x only because the
    // per-source split keeps groups ~10k; a bigger corpus would break it.
    Q("agg_appx_median",
      (s, d) => t(s, d, "documents")
        .orderBy(col("doc_id")).limit(15000)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          expr("appx_median(lang)").as("med_lang"),
          expr("appx_median(n_chars)").as("med_chars"))
        .orderBy(col("source")),
      Some("""WITH documents_p AS (SELECT * FROM documents
        |  ORDER BY doc_id LIMIT 15000),
        |g AS (SELECT source, COUNT(*) c FROM documents_p GROUP BY source),
        |rl AS (SELECT source, lang,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY lang) - 1 rn
        |  FROM documents_p),
        |rc AS (SELECT source, n_chars,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) - 1 rn
        |  FROM documents_p)
        |SELECT g.source, CAST(g.c AS BIGINT) AS n_docs,
        |  (SELECT lang FROM rl WHERE rl.source = g.source AND rl.rn = g.c // 2)
        |    AS med_lang,
        |  (SELECT n_chars FROM rc WHERE rc.source = g.source AND rc.rn = g.c // 2)
        |    AS med_chars
        |FROM g ORDER BY source""".stripMargin)),

    // Single-value sample variance/stddev is 0 in the dialect (the
    // reference's KnuthVar count==1 case), not Spark's NULL — the oracle
    // encodes the Impala semantics explicitly so the gate pins them.
    Q("agg_stats_single",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          count(lit(1)).as("n"),
          expr("variance(l_quantity)").as("var_qty"),
          expr("stddev(l_quantity)").as("stddev_qty"))
        .filter(col("n") === 1)
        .orderBy(col("l_orderkey")),
      Some("""SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
        |  CASE WHEN COUNT(*) = 1 THEN 0.0 ELSE VAR_SAMP(l_quantity) END
        |    AS var_qty,
        |  CASE WHEN COUNT(*) = 1 THEN 0.0 ELSE STDDEV_SAMP(l_quantity) END
        |    AS stddev_qty
        |FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) = 1
        |ORDER BY l_orderkey""".stripMargin)),

    // Impala trunc()/extract() unit codes (udf-builtins.cc:104-145,
    // 336-424): quarter, year-anchored and month-anchored weeks, day of
    // week, hour, minute against DuckDB date arithmetic.
    Q("date_trunc_units",
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") % 7 === 0)
        .selectExpr(
          "o_orderkey",
          "trunc(o_orderdate, 'Q') AS q_start",
          "trunc(o_orderdate, 'YYYY') AS y_start",
          "trunc(o_orderdate, 'MM') AS m_start",
          "trunc(o_orderdate, 'WW') AS ww_start",
          "trunc(o_orderdate, 'W') AS w_start",
          "trunc(o_orderdate, 'DAY') AS wk_monday",
          "trunc(o_orderdate, 'HH24') AS hr_start",
          "trunc(o_orderdate, 'MI') AS mi_start",
          "extract(o_orderdate, 'year') AS y",
          "extract(o_orderdate, 'month') AS mth",
          "extract(o_orderdate, 'day') AS dom",
          "extract(o_orderdate, 'hour') AS hr",
          "extract(o_orderdate, 'epoch') AS epoch_s")
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
        |  DATE_TRUNC('quarter', o_orderdate) AS q_start,
        |  DATE_TRUNC('year', o_orderdate) AS y_start,
        |  DATE_TRUNC('month', o_orderdate) AS m_start,
        |  DATE_TRUNC('day', o_orderdate)
        |    - ((7 + DAYOFWEEK(o_orderdate)
        |         - DAYOFWEEK(DATE_TRUNC('year', o_orderdate))) % 7)
        |      * INTERVAL 1 DAY AS ww_start,
        |  DATE_TRUNC('day', o_orderdate)
        |    - ((7 + DAYOFWEEK(o_orderdate)
        |         - DAYOFWEEK(DATE_TRUNC('month', o_orderdate))) % 7)
        |      * INTERVAL 1 DAY AS w_start,
        |  DATE_TRUNC('week', o_orderdate) AS wk_monday,
        |  DATE_TRUNC('hour', o_orderdate) AS hr_start,
        |  DATE_TRUNC('minute', o_orderdate) AS mi_start,
        |  CAST(YEAR(o_orderdate) AS INT) AS y,
        |  CAST(MONTH(o_orderdate) AS INT) AS mth,
        |  CAST(DAY(o_orderdate) AS INT) AS dom,
        |  CAST(HOUR(o_orderdate) AS INT) AS hr,
        |  CAST(EPOCH(o_orderdate) AS INT) AS epoch_s
        |FROM orders WHERE o_orderkey % 7 = 0
        |ORDER BY o_orderkey""".stripMargin))
  )
}
