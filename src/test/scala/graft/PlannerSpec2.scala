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

  // ------------------------------------------------------------------
  // round-6 breadth: join-order.test, predicate-propagation.test,
  // runtime-filter-propagation.test analogs (VERDICT r5 #10)
  // ------------------------------------------------------------------

  test("join-order.test: star shape — the fact table is never on a build side") {
    // JoinOrder costing keeps the big fact as probe across every dim
    // join (join-order.test's star blocks); here every BroadcastExchange
    // subtree must contain only dimension scans
    val df = sql(
      """select count(*) from lineitem l
        |  join supplier s on l.l_suppkey = s.s_suppkey
        |  join nation n on s.s_nationkey = n.n_nationkey
        |  join region r on n.n_regionkey = r.r_regionkey
        |where r.r_name = 'ASIA'""".stripMargin)
    // walk the static plan tree (AQE's wrapper hides children from
    // collect, and flat text would cross its Initial/Final sections);
    // sparkPlan predates EnsureRequirements, so inspect the joins'
    // build sides rather than exchange nodes
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    val joins = df.queryExecution.sparkPlan.collect {
      case j: BroadcastHashJoinExec => j
    }
    assert(joins.size >= 3, df.queryExecution.sparkPlan.toString)
    joins.foreach { j =>
      val build = j.buildSide match {
        case BuildLeft => j.left
        case BuildRight => j.right
      }
      val factScans = build.collect {
        case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(
              _.toString.contains("lineitem")) => s
      }
      assert(factScans.isEmpty, j.toString)
    }
  }

  test("predicate-propagation.test: transitive pushdown through a 3-way chain") {
    // the equality chain l_partkey = p_partkey with a literal on part
    // must land the literal filter in BOTH scans (ValueTransferGraph
    // across multiple hops)
    val p = physical(sql(
      """select count(*) from lineitem l
        |  join part p on l.l_partkey = p.p_partkey
        |  join orders o on l.l_orderkey = o.o_orderkey
        |where p.p_partkey = 5""".stripMargin))
    assert(p.contains("EqualTo(p_partkey,5)"), p)
    assert(p.contains("EqualTo(l_partkey,5)"), p)
  }

  test("predicate-propagation.test: a group-key filter pushes through an aggregating view") {
    // predicate on the view's group-by key migrates below the aggregate
    // into the scan (the reference pushes through SELECT-list slot refs)
    val p = physical(sql(
      """select * from (
        |  select o_custkey, sum(o_totalprice) t from orders group by o_custkey
        |) v where o_custkey = 7""".stripMargin))
    assert(p.contains("EqualTo(o_custkey,7)"), p)
  }

  test("predicate-propagation.test: a null-rejecting WHERE simplifies LEFT OUTER to INNER") {
    // where right.col = literal rejects the null-extended rows, so the
    // outer join must plan as an inner join (the reference's
    // outer-join simplification; Catalyst EliminateOuterJoin)
    val p = physical(sql(
      """select count(*) from customer c left outer join orders o
        |on c.c_custkey = o.o_custkey
        |where o.o_orderstatus = 'F'""".stripMargin))
    assert(!p.contains("LeftOuter"), p)
  }

  test("predicate-propagation.test: a preserved-side filter pushes below the LEFT OUTER join") {
    // filter on the left (preserved) side reaches its scan while the
    // join itself stays outer
    val df = sql(
      """select count(*) from customer c left outer join orders o
        |on c.c_custkey = o.o_custkey
        |where c.c_mktsegment = 'BUILDING'""".stripMargin)
    val p = physical(df)
    assert(p.contains("LeftOuter"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("runtime-filter-propagation.test: no runtime filter crosses onto a LEFT OUTER probe") {
    // the reference never assigns a runtime filter that would filter
    // the preserved side of an outer join (it would drop rows the join
    // must keep); Spark's bloom-filter injection obeys the same rule
    val p = sql(
      """select count(*) from lineitem l left outer join supplier s
        |on l.l_suppkey = s.s_suppkey and s.s_acctbal > 9999.5"""
        .stripMargin).queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("bloomfilter"), p)
  }

  test("runtime-filter-propagation.test: a selective dim filter reaches the fact scan two hops away") {
    // region -> nation -> supplier -> lineitem: the filter's effect must
    // reach the fact side as a runtime filter (bloom) or DPP-free
    // broadcast chain — the decision pinned: the fact scan is filtered
    // at runtime, not fully scanned into the join
    val df = sql(
      """select count(*) from lineitem l join supplier s
        |on l.l_suppkey = s.s_suppkey
        |join nation n on s.s_nationkey = n.n_nationkey
        |where n.n_name = 'FRANCE'""".stripMargin)
    val opt = df.queryExecution.optimizedPlan.toString
    // bloom injection is size-gated; accept either the bloom filter on
    // the fact or the whole dim chain broadcast (both keep the fact
    // scan from shuffling unfiltered)
    val phys = physical(df)
    assert(opt.toLowerCase.contains("bloomfilter") ||
      phys.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      opt + "\n" + phys)
  }

  test("exchange-reuse: a shared aggregated subtree plans one exchange (q15 shape)") {
    // the reference's planner materializes the shared WITH subtree once
    // per fragment tree; Spark's ReuseExchange must dedup the repeated
    // aggregate-exchange (Tpch2Queries q15 relies on this)
    // AQE performs exchange reuse at stage materialization: run the
    // query, then check the final plan reused the shuffle stage of the
    // shared per-suppkey aggregate instead of recomputing it
    val df = sql(
      """with rev as (
        |  select l_suppkey, sum(l_extendedprice) r from lineitem group by l_suppkey)
        |select a.l_suppkey from rev a
        |join (select max(r) mr from rev) m on a.r = m.mr""".stripMargin)
    df.collect()
    val p = physical(df)
    val reused = p.contains("ReusedExchange") || {
      // final-plan shuffle stages: the shared hashpartitioning(l_suppkey)
      // exchange must materialize once (one distinct stage id for it)
      val stageIds = "ShuffleQueryStage (\\d+)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      stageIds.size > stageIds.distinct.size
    }
    assert(reused, p)
  }

  test("aggregation.test: a grand total still aggregates partial then final") {
    // no group keys: the plan must still be 2-phase (partial per
    // partition, final after a single-partition exchange) — the
    // reference's merge-aggregation shape for plain count/sum
    val p = physical(sql("select count(*), sum(l_quantity) from lineitem"))
    assert(p.split("HashAggregate").length - 1 == 2, p)
    assert(p.contains("SinglePartition"), p)
  }

  test("in-predicate: a long literal IN list stays a pushed scan filter, not a join") {
    val inList = (1 to 30).map(i => i * 7).mkString(", ")
    val p = physical(sql(
      s"select count(*) from lineitem where l_orderkey in ($inList)"))
    assert(p.contains("In(l_orderkey"), p)
    assert(!p.contains("Join"), p)
  }

  test("inline-view.test: a partition-key filter pushes below the view's window") {
    // the reference pushes predicates into inline views only when safe;
    // a filter on the analytic PARTITION key prunes before the window
    val p = physical(sql(
      """select * from (
        |  select o_custkey, o_totalprice,
        |         rank() over (partition by o_custkey order by o_totalprice) r
        |  from orders) v
        |where o_custkey = 7""".stripMargin))
    assert(p.contains("EqualTo(o_custkey,7)"), p)
  }

  test("inline-view.test: a non-partition filter stays above the window") {
    // pushing it below would change which rows rank sees
    val df = sql(
      """select * from (
        |  select o_custkey, o_totalprice,
        |         rank() over (partition by o_custkey order by o_totalprice) r
        |  from orders) v
        |where r = 1""".stripMargin)
    val p = physical(df)
    // the rank filter must NOT reach the scan
    assert(!p.contains("PushedFilters: [IsNotNull(r"), p)
    assert(p.contains("Window"), p)
    // and the orders scan is unfiltered on data columns
    assert(p.linesIterator.exists(l =>
      l.contains("orders.parquet") && l.contains("PushedFilters: []")), p)
  }

  test("values.test: VALUES plans as a local relation — no scan, no exchange") {
    val p = physical(sql(
      "select * from (values (1, 'a'), (2, 'b')) t(id, name) where id > 0"))
    assert(p.contains("LocalTableScan") || p.contains("EmptyRelation"), p)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("FileScan"), p)
  }

  test("joins.test: null-safe equality (<=>) keys still take the hash-join path") {
    // the reference plans IS NOT DISTINCT FROM as a hash join predicate
    // (not a nested loop); Spark's EqualNullSafe is a valid hash key
    val p = physical(sql(
      """select count(*) from orders o join customer c
        |on o.o_custkey <=> c.c_custkey""".stripMargin))
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("outer-joins.test: FULL OUTER equi-join plans as a shuffled merge join") {
    // neither side of a full outer can be the broadcast build (both
    // sides produce null-extended rows) — the reference partitions both
    val df = sql(
      """select count(*) from orders o full outer join customer c
        |on o.o_custkey = c.c_custkey""".stripMargin)
    val p = physical(df)
    assert(p.contains("FullOuter"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
  }

  test("tpcds-all.test: dim constraints reach the fact scan through the derivation CTE; every dim broadcasts") {
    // the round-6 audited star-plan property, pinned: tpcds_q19 filters
    // item on i_manager_id, and because ss_item_sk derives from
    // l_partkey, constraint propagation must rewrite the equality onto
    // the fact side as arithmetic over l_partkey SITTING ON THE SCAN —
    // at 100 TB that filter is the difference between scanning the fact
    // once pre-filtered and carrying every row to the first join. Dims
    // are generated/small, so no shuffled join may appear (the one
    // BroadcastNestedLoopJoin is the intentional broadcast-scalar ccnt
    // cross).
    val df = SparkEntry.queries("tpcds_q19")(spark, TestSpark.sf)
    df.collect()
    val p = physical(df)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val factFilter = p.linesIterator.filter(l =>
      l.contains("Filter") && l.contains("l_partkey") && l.contains("FLOOR"))
    assert(factFilter.nonEmpty,
      s"i_manager_id constraint did not propagate onto the fact scan:\n$p")
  }

  test("insert.test (planner): a dynamic-partition insert sorts by the partition keys before writing") {
    // the reference clusters partitioned inserts so each writer holds
    // one open partition at a time (HdfsTableSink's clustered insert);
    // Spark's V1Writes plans the same property as a Sort on the static
    // +dynamic partition columns above the write — without it every
    // task writes a file per partition it touches (the 100 TB
    // small-files explosion).
    spark.sql("drop table if exists gplan_ins")
    spark.sql(
      "create table gplan_ins (id bigint, v string) using parquet partitioned by (p int)")
    try {
      val df = spark.sql(
        "insert into gplan_ins partition(p) select l_orderkey, 'x', cast(l_orderkey % 7 as int) from lineitem")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("Sort") && p.contains("p#"),
        s"partitioned insert did not sort by partition key:\n$p")
    } finally spark.sql("drop table gplan_ins")
  }
}
