package graft.queries

import graft.{Engine, Q}

/** The reference's operator-primitive perf corpus
  * (`testdata/workloads/targeted-perf/queries/primitive_*.test`,
  * BASELINE.md "Operator primitives") ported as oracle-checked
  * registry entries: one query per scan/filter/aggregation/join/
  * exchange/sort/top-n primitive, run through the SQL front door so
  * the reference's comment-style plan hints (+broadcast, +shuffle,
  * +straight_join) take the same path a user's scripts would.
  *
  * The queries are the reference's own texts with adaptations noted
  * per entry: every output column is aliased (the two engines name
  * `count(*)` differently), `rank()` is cast to BIGINT (Spark types it
  * INT, DuckDB BIGINT), date literals shift into the driver data's
  * 1995-2001 span so the selective/non-selective split stays
  * meaningful, and columns the driver's slimmer TPC-H schema lacks
  * (l_comment, l_commitdate, ...) drop or remap. The perf harness stores no expected
  * values — the HAVING guards that keep the reference's result
  * transfer empty also make the results trivially exact here, and the
  * count/rank shapes are deterministic.
  *
  * 100 TB notes: these ARE the shapes whose scale behavior matters —
  * selective filters must reach the parquet scan (PlanSpec pushdown
  * pins), the selective joins must broadcast their dim side and plant
  * runtime filters on the fact (PlannerSpec2 runtime-filter pins), the
  * fact-to-fact joins must shuffle on the join key only, and top-n
  * must never materialize a global sort (TakeOrderedAndProject).
  */
object PrimitiveQueries {

  /** Shared text on both engines (the TpcdsQueries pattern): the Spark
    * side goes through Engine.sql, the driver re-runs the identical
    * text in DuckDB.
    */
  private def pq(name: String, text: String): Q = Q(
    name,
    run = (s, d) => Engine.sql(s, d, text),
    oracle = Some(text))

  // ---- scan + filter (primitive_filter_*.test) ----

  /** primitive_filter_bigint_selective.test */
  private val filterBigintSel = pq("prim_filter_bigint_sel",
    "SELECT count(*) AS n FROM lineitem WHERE l_orderkey < 20")

  /** primitive_filter_bigint_non_selective.test */
  private val filterBigintNonSel = pq("prim_filter_bigint_nonsel",
    "SELECT count(*) AS n FROM lineitem WHERE l_orderkey > 20")

  /** primitive_filter_decimal_selective.test */
  private val filterDecimalSel = pq("prim_filter_decimal_sel",
    "SELECT count(*) AS n FROM lineitem WHERE l_extendedprice < 904.00")

  /** primitive_filter_decimal_non_selective.test */
  private val filterDecimalNonSel = pq("prim_filter_decimal_nonsel",
    "SELECT count(*) AS n FROM lineitem WHERE l_extendedprice > 904.00")

  /** primitive_filter_string_selective.test (l_shipdate is a timestamp
    * here as in the driver data; both engines coerce the literal).
    */
  private val filterStringSel = pq("prim_filter_string_sel",
    "SELECT count(*) AS n FROM lineitem WHERE l_shipdate < '1995-01-09'")

  /** primitive_filter_string_non_selective.test */
  private val filterStringNonSel = pq("prim_filter_string_nonsel",
    "SELECT count(*) AS n FROM lineitem WHERE l_shipdate <= '2001-12-01'")

  /** primitive_filter_string_like.test — the driver schema carries no
    * l_comment; the multi-wildcard LIKE runs over part's name column,
    * the suite's free-text field.
    */
  private val filterStringLike = pq("prim_filter_string_like",
    """SELECT Count(*) AS n
      |FROM part
      |WHERE p_name LIKE '%ge%ar%%'
      |LIMIT 100""".stripMargin)

  // ---- aggregation (primitive_groupby_*.test) ----

  /** primitive_groupby_bigint_highndv.test — the HAVING keeps the
    * result set empty (the reference measures the aggregation, not the
    * transfer); the empty relation is what the oracle checks.
    */
  private val groupbyBigintHigh = pq("prim_groupby_bigint_highndv",
    """SELECT l_orderkey, count(*) AS cnt
      |FROM lineitem
      |GROUP BY l_orderkey
      |HAVING count(*) > 9999999999999""".stripMargin)

  /** primitive_groupby_bigint_lowndv.test */
  private val groupbyBigintLow = pq("prim_groupby_bigint_lowndv",
    """SELECT l_linenumber, count(*) AS cnt
      |FROM lineitem
      |GROUP BY l_linenumber
      |HAVING count(*) > 9999999999999""".stripMargin)

  /** primitive_groupby_bigint_pk.test */
  private val groupbyBigintPk = pq("prim_groupby_bigint_pk",
    """SELECT l_orderkey, l_partkey, count(*) AS cnt
      |FROM lineitem
      |GROUP BY l_orderkey, l_partkey
      |HAVING count(*) > 9999999999999""".stripMargin)

  /** primitive_groupby_decimal_highndv.test */
  private val groupbyDecimalHigh = pq("prim_groupby_decimal_highndv",
    """SELECT l_extendedprice, count(*) AS cnt
      |FROM lineitem
      |GROUP BY l_extendedprice
      |HAVING count(*) > 9999999999999""".stripMargin)

  /** primitive_groupby_decimal_lowndv.test */
  private val groupbyDecimalLow = pq("prim_groupby_decimal_lowndv",
    """SELECT l_discount, count(*) AS cnt
      |FROM lineitem
      |GROUP BY l_discount
      |HAVING count(*) > 9999999999999""".stripMargin)

  // ---- selective broadcast joins (primitive_broadcast_join_*.test) ----

  /** primitive_broadcast_join_1.test — the supplier name targets the
    * perf harness's huge SF, so the dim side filters to zero rows here;
    * the plan still builds the broadcast + runtime filter.
    */
  private val broadcastJoin1 = pq("prim_broadcast_join_1",
    """SELECT /* +straight_join */ count(*) AS n
      |FROM lineitem
      |JOIN /* +broadcast */ supplier ON l_suppkey = s_suppkey
      |AND s_name = 'Supplier#000000042'""".stripMargin)

  /** primitive_broadcast_join_2.test */
  private val broadcastJoin2 = pq("prim_broadcast_join_2",
    """SELECT /* +straight_join */ count(*) AS n
      |FROM lineitem
      |JOIN /* +broadcast */ supplier ON l_suppkey = s_suppkey
      |JOIN /* +broadcast */ part ON l_partkey = p_partkey
      |WHERE s_name = 'Supplier#000000042'
      |  AND p_brand < 'Brand#20'""".stripMargin)

  /** primitive_broadcast_join_3.test */
  private val broadcastJoin3 = pq("prim_broadcast_join_3",
    """SELECT /* +straight_join */ count(*) AS n
      |FROM lineitem
      |JOIN /* +broadcast */ supplier ON l_suppkey = s_suppkey
      |JOIN /* +broadcast */ part ON l_partkey = p_partkey
      |JOIN /* +broadcast */ orders ON l_orderkey = o_orderkey
      |WHERE s_name = 'Supplier#000000042'
      |  AND p_brand < 'Brand#30'
      |  AND o_orderdate < '1997-01-01'""".stripMargin)

  // ---- exchange stress (primitive_exchange_*.test) ----

  /** primitive_exchange_broadcast.test — a large build side with a
    * zero-row probe (n_regionkey < 0).
    */
  private val exchangeBroadcast = pq("prim_exchange_broadcast",
    """SELECT /* +straight_join */ count(*) AS n
      |FROM nation
      |JOIN /* +broadcast */ lineitem ON l_orderkey = n_nationkey
      |WHERE l_partkey > 0
      |  AND l_suppkey > 0
      |  AND l_linenumber > 0
      |  AND n_regionkey < 0
      |  AND l_orderkey < 350000000""".stripMargin)

  /** primitive_exchange_shuffle.test — fact-to-fact self join on the
    * join key only.
    */
  private val exchangeShuffle = pq("prim_exchange_shuffle",
    """SELECT /* +straight_join */ count(*) AS n
      |FROM lineitem l1
      |JOIN /* +shuffle */ lineitem l2 ON l1.l_orderkey = l2.l_orderkey
      |WHERE l2.l_partkey > 0""".stripMargin)

  // ---- fact-to-fact shuffle joins with aggregation ----

  /** primitive_shuffle_join_one_to_many_string_with_groupby.test */
  private val shuffleJoinString = pq("prim_shuffle_join_string_groupby",
    """SELECT Count(*) AS cnt
      |FROM
      |  (SELECT Upper(Concat(Cast(l_orderkey AS STRING), 'bla')) AS l_orderkey_string
      |   FROM lineitem) l
      |JOIN /* +shuffle */
      |  (SELECT upper(concat(cast(o_orderkey AS string), 'bla')) o_orderkey_string
      |   FROM orders) o ON l.l_orderkey_string = o.o_orderkey_string
      |GROUP BY o.o_orderkey_string
      |HAVING count(*) = 999999""".stripMargin)

  /** primitive_shuffle_join_union_all_with_groupby.test */
  private val shuffleJoinUnion = pq("prim_shuffle_join_union_groupby",
    """SELECT Count(*) AS rowcount
      |FROM (
      |    SELECT /* +straight_join */ l_orderkey
      |    FROM lineitem l1
      |    INNER JOIN /* +shuffle */ orders o1 ON l1.l_orderkey = o1.o_orderkey
      |    WHERE l_shipdate < '1997-01-01'
      |        AND o1.o_orderdate < '1997-01-01'
      |    GROUP BY l_orderkey
      |    UNION ALL
      |    SELECT /* +straight_join */ l_orderkey
      |    FROM lineitem l2
      |    INNER JOIN /* +shuffle */ orders o2 ON l2.l_orderkey = o2.o_orderkey
      |    WHERE l_shipdate < '1997-01-01'
      |        AND o2.o_orderdate < '1997-01-01'
      |    GROUP BY l_orderkey
      |    ) a
      |GROUP BY l_orderkey
      |HAVING count(*) = 99999999""".stripMargin)

  // ---- sort / top-n (primitive_orderby_*.test, primitive_top-n_*.test) ----

  /** primitive_orderby_bigint.test — rank cast to BIGINT (Spark types
    * rank() INT, DuckDB BIGINT).
    */
  private val orderbyBigint = pq("prim_orderby_bigint",
    """SELECT *
      |FROM (SELECT cast(Rank() OVER (ORDER BY l_orderkey) as bigint) AS rank
      |      FROM lineitem
      |      WHERE l_shipdate < '1995-02-09') a
      |WHERE rank < 10""".stripMargin)

  /** primitive_orderby_all.test — the full-width sort key (all 11
    * driver lineitem columns).
    */
  private val orderbyAll = pq("prim_orderby_all",
    """SELECT *
      |FROM (
      |  SELECT cast(Rank() OVER (
      |      ORDER BY l_extendedprice, l_orderkey, l_partkey, l_suppkey,
      |        l_linenumber, l_quantity, l_discount, l_tax, l_returnflag,
      |        l_linestatus, l_shipdate) as bigint) AS rank
      |  FROM lineitem
      |  WHERE l_shipdate < '1995-02-09') a
      |WHERE rank < 10""".stripMargin)

  /** primitive_top-n_bigint.test */
  private val topnBigint = pq("prim_topn_bigint",
    """SELECT count(*) AS n
      |FROM (SELECT l_orderkey
      |      FROM lineitem
      |      ORDER BY l_orderkey LIMIT 1000000) a""".stripMargin)

  /** primitive_top-n_all.test — all 11 driver lineitem columns. */
  private val topnAll = pq("prim_topn_all",
    """SELECT count(*) AS n
      |FROM
      |  (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
      |     l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
      |     l_linestatus, l_shipdate
      |   FROM lineitem
      |   ORDER BY l_extendedprice, l_orderkey, l_partkey, l_suppkey,
      |     l_linenumber, l_quantity, l_discount, l_tax, l_returnflag,
      |     l_linestatus, l_shipdate
      |   LIMIT 1000000) a""".stripMargin)

  // ---- the three non-primitive targeted-perf files ----
  // (`limit.test` PERF_LIMIT-Q1 `SELECT * ... LIMIT 0` is the existing
  // `limit_zero` entry)

  /** `targeted-perf/queries/aggregation.test` PERF_AGG-Q1: the
    * mixed-type global aggregate (count / min INT / max DOUBLE /
    * rounded decimal sum); l_tax sums Det-style — exact per-row 2dp
    * decimal cast, one double cast at output.
    */
  private val perfAggMixed = pq("prim_perf_agg_mixed",
    "SELECT count(*) AS n, min(l_linenumber) AS mn, " +
      "max(l_quantity) AS mx, " +
      "CAST(SUM(CAST(l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_tax " +
      "FROM lineitem")

  /** `targeted-perf/queries/string.test` PERF_STRING Q1-Q7: the LIKE
    * anchor matrix (equality, wildcard-free LIKE, prefix/suffix/infix
    * `%`, inner `%`, lower()-equality) in one pass over the documents
    * text (the driver lineitem has no l_comment; the anchor semantics
    * are what the file pins).
    */
  private val perfStringLike = pq("prim_perf_string_like",
    "SELECT " +
      "count(CASE WHEN text = 'the' THEN 1 END) AS c_eq, " +
      "count(CASE WHEN text LIKE 'the' THEN 1 END) AS c_like_exact, " +
      "count(CASE WHEN text LIKE 'the%' THEN 1 END) AS c_prefix, " +
      "count(CASE WHEN text LIKE '%the' THEN 1 END) AS c_suffix, " +
      "count(CASE WHEN text LIKE '%the%' THEN 1 END) AS c_infix, " +
      "count(CASE WHEN text LIKE 'th%e' THEN 1 END) AS c_inner, " +
      "count(CASE WHEN lower(text) = 'the' THEN 1 END) AS c_lower " +
      "FROM documents")

  val defs: Seq[Q] = Seq(
    filterBigintSel, filterBigintNonSel, filterDecimalSel,
    filterDecimalNonSel, filterStringSel, filterStringNonSel,
    filterStringLike,
    groupbyBigintHigh, groupbyBigintLow, groupbyBigintPk,
    groupbyDecimalHigh, groupbyDecimalLow,
    broadcastJoin1, broadcastJoin2, broadcastJoin3,
    exchangeBroadcast, exchangeShuffle,
    shuffleJoinString, shuffleJoinUnion,
    orderbyBigint, orderbyAll, topnBigint, topnAll,
    perfAggMixed, perfStringLike)
}
