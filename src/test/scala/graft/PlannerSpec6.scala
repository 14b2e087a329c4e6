package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the last PlannerTest files without an analog:
  * `views.test`, `ddl.test` (CTAS), `data-source-tables.test`,
  * `nested-collections.test`, `tpch-nested.test`,
  * `complex-types-file-formats.test` (all under
  * `testdata/workloads/functional-planner/queries/PlannerTest/`).
  * With these, every PlannerTest file is either pinned or
  * skip-documented in SURVEY 11.3.
  */
class PlannerSpec6 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sql(q: String): DataFrame = Engine.sql(spark, TestSpark.sf, q)
  private def phys(df: DataFrame): String =
    df.queryExecution.sparkPlan.toString

  // ---- views.test ----------------------------------------------------

  // views.test:1-11: a view expands to the bare base-table scan — no
  // materialization, no extra plan nodes.
  test("views.test: view expands to the base scan, zero overhead") {
    sql("select 1").collect() // mount base tables
    spark.sql("create or replace temporary view ps6_v as " +
      "select o_orderkey, o_custkey, o_totalprice from orders")
    val p = phys(spark.sql("select o_orderkey from ps6_v"))
    assert(p.contains("FileScan parquet"), p)
    assert(!p.contains("Join") && !p.contains("Aggregate"), p)
    // column pruning reaches THROUGH the view: only the selected column
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint>"), p)
  }

  // views.test:78-101: predicates OUTSIDE the view push into the base
  // scan inside it (union branches keep their own pushed predicates).
  test("views.test: outer predicate pushes through the view into the scan") {
    spark.sql("create or replace temporary view ps6_v as " +
      "select o_orderkey, o_custkey, o_totalprice from orders")
    val p = phys(spark.sql("select * from ps6_v where o_orderkey < 10"))
    assert("PushedFilters: \\[[^\\]]*LessThan\\(o_orderkey,10\\)".r
      .findFirstIn(p).isDefined, p)
  }

  // views.test:67-76: a view on a view collapses to the same bare scan.
  test("views.test: view-on-view collapses to one scan") {
    spark.sql("create or replace temporary view ps6_v as " +
      "select o_orderkey, o_custkey, o_totalprice from orders")
    spark.sql("create or replace temporary view ps6_vv as " +
      "select o_orderkey, o_custkey from ps6_v")
    val p = phys(spark.sql("select o_orderkey from ps6_vv"))
    assert(p.split("FileScan").length - 1 == 1, p)
    assert(!p.contains("Join"), p)
  }

  // views.test:212-249: self-join of a view clones the instances — two
  // independent scans under one equi-join, no ambiguity.
  test("views.test: view self-join clones instances") {
    spark.sql("create or replace temporary view ps6_v as " +
      "select o_orderkey, o_custkey, o_totalprice from orders")
    val df = spark.sql(
      """select a.o_orderkey from ps6_v a join ps6_v b
        |on a.o_orderkey = b.o_orderkey where b.o_totalprice > 0""".stripMargin)
    val p = phys(df)
    assert(p.split("FileScan").length - 1 == 2, p)
    assert(p.contains("Join"), p)
    assert(df.count() > 0)
  }

  // ---- ddl.test (CTAS) -----------------------------------------------

  // ddl.test:1-13: CTAS plans a write sink directly over the select
  // (WRITE TO HDFS over the scan); ddl.test:15-35: a CTAS with
  // distinct+join keeps the full 2-phase aggregate/join plan beneath
  // the write — the sink never changes the query subtree.
  test("ddl.test: CTAS = write over the unchanged select subtree") {
    sql("select 1").collect()
    spark.sql("drop table if exists ps6_ctas")
    val df = spark.sql(
      """create table ps6_ctas using parquet as
        |select distinct o_custkey from orders where o_orderkey < 500""".stripMargin)
    try {
      // the CTAS plans as the write command over the UNCHANGED select
      // subtree (Distinct + pushed filter survive under the command,
      // the WRITE TO HDFS shape); the write's own physical run is a
      // sub-execution, so the subtree is pinned at the command level
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("CreateDataSourceTableAsSelectCommand"), p)
      assert(p.contains("Distinct"), p)
      assert(p.contains("Filter (o_orderkey"), p)
      assert(spark.table("ps6_ctas").count() ===
        sql("select distinct o_custkey from orders where o_orderkey < 500").count())
    } finally spark.sql("drop table if exists ps6_ctas")
  }

  // ---- data-source-tables.test ---------------------------------------

  // data-source-tables.test:1-40: the external source accepts the
  // conjuncts it can evaluate (its "data source predicates") and
  // returns the rest as residual ("predicates") for the engine. The
  // DSv2 analog: AllTypesSource accepts id range conjuncts into
  // pushedFilters; everything else stays in a Filter above the scan.
  test("data-source-tables.test: accepted vs residual conjuncts split at the source") {
    // string_col is the id rendered as a string, null every 5th row —
    // the != predicate is residual (the source only accepts id ranges)
    // and its null semantics drop the 8 null rows of the 40-id range
    val df = spark.read.format("graft.sources.AllTypesSource")
      .option("rows", "100").load()
      .filter(col("id") >= 10 && col("id") < 50 &&
        col("string_col") =!= "no-such-value")
    val p = df.queryExecution.executedPlan.toString
    // accepted: the id range reached the source (the scan description
    // prints its accepted conjuncts, or DSv2 shows them as pushed)
    assert(p.contains("accepted=[id >= 10, id < 50]") ||
      p.contains("GreaterThanOrEqual(id,10)"), p)
    // residual: the string predicate stays an engine-side Filter node
    val filterLine = p.linesIterator
      .find(l => l.contains("Filter") && l.toLowerCase.contains("string_col"))
    assert(filterLine.isDefined, p)
    assert(df.count() === 32)
  }

  // ---- nested-collections.test / tpch-nested.test --------------------

  private lazy val nestedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ps6_nested").toString
    // tpch_nested_parquet.customer analog: customer -> c_orders array
    // of structs, each with an o_lineitems array of structs
    val li = Engine.table(spark, TestSpark.sf, "lineitem")
      .filter(col("l_orderkey") < 2000)
      .groupBy(col("l_orderkey"))
      .agg(collect_list(struct(
        col("l_linenumber").as("l_linenumber"),
        col("l_quantity").as("l_quantity"),
        col("l_extendedprice").as("l_extendedprice"),
        col("l_returnflag").as("l_returnflag"))).as("o_lineitems"))
    Engine.table(spark, TestSpark.sf, "orders")
      .filter(col("o_orderkey") < 2000)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(collect_list(struct(col("o_orderkey").as("o_orderkey"),
        col("o_totalprice").as("o_totalprice"),
        col("o_lineitems").as("o_lineitems"))).as("c_orders"))
      .write.mode("overwrite").parquet(s"$dir/customer_nested.parquet")
    dir
  }

  // nested-collections.test:1-27: scanning a collection path applies
  // the item predicate right at the unnest, before any aggregate.
  test("nested-collections.test: item predicate evaluates at the unnest, below the agg") {
    val df = spark.read.parquet(s"$nestedDir/customer_nested.parquet")
      .select(explode(col("c_orders")).as("o"))
      .select(col("o.o_totalprice").as("p"))
      .filter(col("p") > 1000.0)
      .agg(count(lit(1)).as("n"))
    val p = phys(df)
    // Generate (the unnest) with the Filter between it and the agg —
    // the plan prints top-down, so: HashAggregate ... Filter ... Generate
    assert(p.contains("Generate"), p)
    val fi = p.indexOf("Filter")
    val ai = p.indexOf("HashAggregate")
    assert(fi >= 0 && ai >= 0 && ai < fi, p)
    assert(fi < p.lastIndexOf("Generate"), p)
    df.collect()
  }

  // tpch-nested.test:1-40 (TPCH-Q1 over
  // customer.c_orders.o_lineitems): the doubly-nested aggregate is ONE
  // scan + unnests + 2-phase agg — and nested schema pruning reads
  // ONLY the lineitem fields touched, not the whole customer struct
  // (the scan pin's 577.87MB is the pruned collection, not the table).
  test("tpch-nested.test: q1 over the nested path — one pruned scan, unnests, 2-phase agg") {
    val df = spark.read.parquet(s"$nestedDir/customer_nested.parquet")
      .select(explode(col("c_orders")).as("o"))
      .select(explode(col("o.o_lineitems")).as("l"))
      .groupBy(col("l.l_returnflag").as("l_returnflag"))
      .agg(sum(col("l.l_quantity")).as("sum_qty"),
        count(lit(1)).as("count_order"))
    val p = phys(df)
    assert(p.split("FileScan").length - 1 == 1, p)
    assert(p.split("Generate").length - 1 == 2, p)
    assert(p.split("HashAggregate").length - 1 >= 2, p)
    // nested schema pruning: the scan reads ONLY the c_orders.o_lineitems
    // branch — the sibling order fields (o_totalprice, o_orderkey) are
    // pruned out of the parquet read entirely (the ref pin's 577.87MB
    // is the collection subtree, not the whole customer table)
    val rs = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(rs.contains("o_lineitems"), p)
    assert(!rs.contains("o_totalprice") && !rs.contains("o_orderkey"), p)
    assert(df.count() > 0)
  }

  // ---- complex-types-file-formats.test -------------------------------

  // The reference REJECTS complex types outside parquet (orc); Spark
  // reads nested data from parquet AND json/avro — a deliberate
  // superset, pinned here so the divergence is recorded: the same
  // nested row round-trips through both formats.
  test("complex-types-file-formats.test: nested types readable from parquet AND json (superset)") {
    val dir = java.nio.file.Files.createTempDirectory("ps6_fmt").toString
    val src = spark.read.parquet(s"$nestedDir/customer_nested.parquet")
      .limit(50)
    src.write.mode("overwrite").json(s"$dir/j")
    val viaJson = spark.read.json(s"$dir/j")
    // same per-customer order counts through either format
    def counts(df: DataFrame): Map[Long, Int] =
      df.select(col("o_custkey"), size(col("c_orders")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(counts(viaJson) === counts(src))
  }
}
