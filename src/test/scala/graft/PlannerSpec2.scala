package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planner-decision parity with the reference's PlannerTest corpus
  * (`testdata/workloads/functional-planner/queries/PlannerTest/`).
  *
  * The reference pins full EXPLAIN plans; plan text here is Spark's, so
  * each test instead asserts the DECISION the corresponding PlannerTest
  * file exists to lock in — the property that makes the query scale.
  * One test per reference file, named after it. (PlanSpec covers the
  * scan/pushdown/topn/DPP/runtime-filter decisions.)
  */
class PlannerSpec2 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sql(q: String): DataFrame = Engine.sql(spark, TestSpark.sf, q)
  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("implicit-joins.test: comma joins with WHERE equi-conjuncts become hash joins, not cartesians") {
    // SingleNodePlanner turns implicit cross joins + where into hash
    // joins (ImplicitJoins); Catalyst's ReorderJoin does the same.
    val p = physical(sql(
      """select count(*) from lineitem l, orders o, customer c
        |where l.l_orderkey = o.o_orderkey and o.o_custkey = c.c_custkey
        |  and c.c_mktsegment = 'BUILDING'""".stripMargin))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("nested-loop-join.test: only genuinely non-equi predicates take the NLJ path") {
    // a mixed conjunct (equi AND theta) must extract the equi part as
    // the hash-join key and keep the theta part as an other-conjunct —
    // PartitionedHashJoinNode's otherJoinConjuncts, Spark's
    // ExtractEquiJoinKeys
    val mixed = physical(sql(
      """select count(*) from orders o join customer c
        |on o.o_custkey = c.c_custkey and o.o_totalprice > c.c_acctbal"""
        .stripMargin))
    assert(!mixed.contains("NestedLoopJoin") && !mixed.contains("CartesianProduct"), mixed)
    // pure theta join takes NLJ (NestedLoopJoinNode), broadcasting the
    // small side rather than a cartesian shuffle
    val theta = physical(sql(
      """select count(*) from nation a join nation b
        |on a.n_nationkey < b.n_nationkey""".stripMargin))
    assert(theta.contains("BroadcastNestedLoopJoin"), theta)
  }

  test("inline-view-limit.test: limits nest without re-sorting or re-shuffling") {
    val df = sql(
      """select * from (
        |  select l_orderkey, l_extendedprice from lineitem
        |  order by l_extendedprice desc limit 100) v
        |limit 10""".stripMargin)
    df.collect()
    val p = physical(df)
    // the inner ordered-limit is a Top-N; the outer limit must not add
    // a second global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.linesIterator.count(l => l.contains("Sort") && l.contains("global=true")) == 0, p)
  }

  test("predicate-propagation.test: a join-key filter reaches BOTH scans") {
    // ValueTransferGraph in the reference propagates l_orderkey = 32
    // across the equi-join; Catalyst's InferFiltersFromConstraints +
    // pushdown must land it in both parquet scans' PushedFilters
    val p = physical(sql(
      """select count(*) from lineitem l join orders o
        |on l.l_orderkey = o.o_orderkey where o.o_orderkey = 32""".stripMargin))
    // the filter was written on orders only; it must be pushed into the
    // lineitem scan too
    assert(p.contains("EqualTo(l_orderkey,32)"), p)
    assert(p.contains("EqualTo(o_orderkey,32)"), p)
  }

  test("partition-key-scans.test: distinct over a partition key reads no data columns") {
    // the reference answers min/max/distinct over partition keys from
    // catalog metadata (PartitionKeyScanner); Spark's analog decision is
    // a scan whose ReadSchema is EMPTY (partition values come from the
    // directory listing, zero data bytes per file)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_pspec2_pk"
    Engine.table(spark, TestSpark.sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val df = spark.read.parquet(dir).select(col("o_year")).distinct()
    val p = physical(df)
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("ReadSchema: struct<>"), p)
  }

  test("distinct.test: mixed distinct + non-distinct aggregates rewrite to the two-phase plan") {
    // AggregateInfo's phase-2 distinct rewrite: a single distinct agg
    // folds the distinct key into phase-1 grouping (4-level aggregate),
    // never buffering per-group rows
    val p = physical(sql(
      """select l_returnflag, count(distinct l_partkey), sum(l_quantity)
        |from lineitem group by l_returnflag""".stripMargin))
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 3, p)
    assert(p.contains("keys=[l_returnflag") && p.contains("l_partkey"), p)
    // multiple distinct aggs take the Expand-based rewrite
    // (RewriteDistinctAggregates — the reference plans the same shape as
    // repeated phase-1s over a union'd input)
    val multi = physical(sql(
      """select l_returnflag, count(distinct l_partkey),
        |  count(distinct l_suppkey), sum(l_quantity)
        |from lineitem group by l_returnflag""".stripMargin))
    assert(multi.contains("Expand"), multi)
  }

  test("union.test: UNION ALL is a no-shuffle passthrough; DISTINCT adds exactly one aggregation") {
    val all = physical(sql(
      "select n_nationkey from nation union all select r_regionkey from region"))
    assert(all.contains("Union"), all)
    assert(!all.contains("Exchange"), all)
    val dist = sql(
      "select n_nationkey from nation union select r_regionkey from region")
    val p = physical(dist)
    assert(p.contains("Union"), p)
    assert(p.linesIterator.count(_.contains("HashAggregate")) == 2, p) // partial+final
  }

  test("constant.test: constant-only selects fold at plan time — no scan, no exchange") {
    val p = physical(sql("select 10 * 20, concat('a', 'b'), 1 + 2 * 3"))
    assert(!p.contains("Scan parquet"), p)
    assert(!p.contains("Exchange"), p)
    // values are folded into the leaf relation, not computed per-row
    assert(p.contains("200") || p.contains("LocalTableScan") || p.contains("OneRowRelation"), p)
  }

  test("empty.test: provably-empty plans collapse to an empty relation (EmptySetNode)") {
    val df = sql("select l_orderkey from lineitem where 1 = 0")
    df.collect()
    val p = physical(df)
    assert(!p.contains("Scan parquet"), p)
    assert(p.contains("LocalTableScan <empty>") || p.contains("LocalTableScan"), p)
    // and limit-0 the same (reference plans EmptySetNode for LIMIT 0)
    val p0 = physical(sql("select l_orderkey from lineitem limit 0"))
    assert(!p0.contains("Scan parquet"), p0)
  }

  test("mem-limit-broadcast-join.test: the broadcast decision respects the size budget") {
    // DistributedPlanner falls back to a partitioned join when the
    // build side exceeds the mem limit; Spark's analog knob is
    // autoBroadcastJoinThreshold (+ AQE runtime demotion)
    val q = """select count(*) from lineitem l join orders o
              |on l.l_orderkey = o.o_orderkey""".stripMargin
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = physical(sql(q))
      assert(!p.contains("BroadcastHashJoin"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val p2 = physical(sql(q))
    assert(p2.contains("BroadcastHashJoin") || p2.contains("BroadcastExchange"), p2)
  }

  test("analytic-fns.test (planner): compatible window groups share one sort") {
    // AnalyticPlanner groups analytic exprs by compatible
    // partition/order so each sort-group sorts ONCE; Spark must plan
    // one Window + one Sort for same-spec functions
    val df = sql(
      """select o_custkey,
        |  rank() over (partition by o_custkey order by o_totalprice) r,
        |  sum(o_totalprice) over (partition by o_custkey order by o_totalprice) s,
        |  lag(o_totalprice) over (partition by o_custkey order by o_totalprice) l
        |from orders""".stripMargin)
    val p = physical(df)
    assert(p.linesIterator.count(_.trim.matches(".*\\bWindow\\b.*")) <= 2, p)
    assert(p.linesIterator.count(_.contains("Sort ")) == 1, p)
    // incompatible specs get their own sort group, nothing more
    val df2 = sql(
      """select o_custkey,
        |  rank() over (partition by o_custkey order by o_totalprice) r,
        |  rank() over (partition by o_orderpriority order by o_orderdate) r2
        |from orders""".stripMargin)
    val p2 = physical(df2)
    assert(p2.linesIterator.count(_.contains("Sort ")) == 2, p2)
  }

  test("small-query-opt.test: a tiny limit scan short-circuits — no shuffle, no global stage") {
    // the reference plans small scans single-node (SmallQueryOpt);
    // Spark's analog: limit without ordering is CollectLimit over the
    // scan with no exchange
    val p = physical(sql("select l_orderkey, l_quantity from lineitem limit 5"))
    assert(p.contains("CollectLimit") || p.contains("GlobalLimit"), p)
    assert(!p.contains("Exchange") || p.contains("SinglePartition"), p)
  }

  test("subquery-rewrite.test: IN/EXISTS/scalar subqueries all become joins, never per-row subplans") {
    // StmtRewriter rewrites every subquery form to a join before
    // planning (subquery-rewrite.test pins the shapes); Catalyst's
    // RewritePredicateSubquery must do the same — the physical plan may
    // not contain an uncorrelated per-row subquery execution
    val in = physical(sql(
      """select count(*) from orders
        |where o_custkey in (select c_custkey from customer
        |                    where c_mktsegment = 'BUILDING')""".stripMargin))
    assert(in.contains("LeftSemi"), in)
    val exists = physical(sql(
      """select count(*) from customer c
        |where exists (select 1 from orders o
        |              where o.o_custkey = c.c_custkey
        |                and o.o_totalprice > 100)""".stripMargin))
    assert(exists.contains("LeftSemi"), exists)
    val notExists = physical(sql(
      """select count(*) from customer c
        |where not exists (select 1 from orders o
        |                  where o.o_custkey = c.c_custkey)""".stripMargin))
    assert(notExists.contains("LeftAnti"), notExists)
    // correlated scalar aggregate: decorrelates to an aggregate joined
    // back on the correlation key (one pass over orders, not one scan
    // per customer row)
    val scalar = sql(
      """select c_custkey from customer c
        |where c_acctbal > (select coalesce(sum(o_totalprice), 0)
        |                   from orders o where o.o_custkey = c.c_custkey)"""
        .stripMargin)
    scalar.collect()
    val sp = physical(scalar)
    // the decorrelated shape: aggregate orders once, LEFT OUTER join it
    // back on the correlation key; no subquery operator survives
    assert(sp.contains("LeftOuter"), sp)
    assert(sp.contains("HashAggregate"), sp)
    assert(!sp.contains("InSubquery") && !sp.contains("SubqueryExec"), sp)
  }

  test("order.test: a global ORDER BY plans one range-partitioned sort (merging exchange parity)") {
    // the reference's sorted fragments merge in a single merging
    // exchange (DataStreamSink merge); Spark's analog decision is ONE
    // rangepartitioning exchange feeding a global sort — never a
    // single-partition sort of the whole table
    val df = sql(
      """select l_orderkey, l_extendedprice from lineitem
        |order by l_extendedprice desc, l_orderkey""".stripMargin)
    df.collect()
    val p = physical(df)
    assert(p.contains("rangepartitioning"), p)
    // physical SortExec prints "Sort [keys], <global>, 0" — the global
    // sort must be present, and only as the range-partitioned one
    assert(p.linesIterator.exists(l => l.contains("Sort [") && l.contains(", true, 0")), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("topn.test: ORDER BY + LIMIT + OFFSET stays a Top-N, offset applied in the operator") {
    // TopNNode carries the offset (topn.test offset blocks); Spark 4's
    // TakeOrderedAndProject does the same — no global sort, no separate
    // offset stage
    val df = sql(
      """select o_orderkey, o_totalprice from orders
        |order by o_totalprice desc, o_orderkey limit 10 offset 5""".stripMargin)
    assert(df.collect().length == 10)
    val p = physical(df)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("offset=5") || p.contains("offset: 5") || !p.contains("Sort "), p)
  }

  test("join-order.test: the optimizer puts the filtered small side on the build") {
    // JoinOrder costing in the reference picks the dimension as build;
    // with CBO off Spark keys off size hints/AQE — the BUILT side must
    // be the filtered nation, i.e. it gets broadcast
    val df = sql(
      """select count(*) from lineitem l
        |  join supplier s on l.l_suppkey = s.s_suppkey
        |  join nation n on s.s_nationkey = n.n_nationkey
        |where n.n_name = 'FRANCE'""".stripMargin)
    df.collect()
    val p = physical(df)
    // both dimension joins broadcast; the fact table is never built
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2, p)
  }
}
