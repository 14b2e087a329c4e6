package graft

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Stats + cost-based-optimizer parity with the reference's planner
  * costing (`fe/.../planner/SingleNodePlanner.java:329-493` orders joins
  * by cardinality estimates computed from COMPUTE STATS table/column
  * stats; `ComputeStatsStmt.java` collects them).
  *
  * Spark equivalents: managed tables in the session catalog hold stats
  * from ANALYZE TABLE, `spark.sql.cbo.enabled` turns on stats-based
  * costing, and CostBasedJoinReorder is the planner twin of the
  * reference's join ordering. Temp views over bare parquet cannot hold
  * ANALYZE results — hence the local warehouse via saveAsTable.
  */
class CboSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def setup(): Unit = {
    if (!spark.catalog.tableExists("cbo_lineitem")) {
      for (t <- Seq("cbo_lineitem", "cbo_orders", "cbo_customer")) {
        // the in-memory catalog forgets tables across JVMs but their
        // warehouse directories survive — clear stale locations
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir")
            .stripPrefix("file:"), t)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete()
          }
          rm(loc)
        }
      }
      Engine.table(spark, TestSpark.sf, "lineitem")
        .write.mode(SaveMode.Overwrite).saveAsTable("cbo_lineitem")
      Engine.table(spark, TestSpark.sf, "orders")
        .write.mode(SaveMode.Overwrite).saveAsTable("cbo_orders")
      Engine.table(spark, TestSpark.sf, "customer")
        .write.mode(SaveMode.Overwrite).saveAsTable("cbo_customer")
    }
  }

  test("ANALYZE TABLE records exact row counts (COMPUTE STATS parity)") {
    setup()
    spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
    val expected = spark.table("cbo_lineitem").count()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("cbo_lineitem")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(expected)))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("column stats (ndv, min/max) land in the catalog like COMPUTE STATS") {
    setup()
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS " +
      "o_orderkey, o_custkey")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val attrStats = spark.table("cbo_orders")
        .queryExecution.optimizedPlan.stats.attributeStats
      val custStats = attrStats.find(_._1.name == "o_custkey").map(_._2)
      assert(custStats.isDefined, "o_custkey column stats missing")
      assert(custStats.get.distinctCount.exists(_ > 0))
      assert(custStats.get.min.isDefined && custStats.get.max.isDefined)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("CBO join estimates use column ndv; disabled falls back to size-only") {
    setup()
    spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey")
    val q = "SELECT * FROM cbo_lineitem l JOIN cbo_orders o " +
      "ON l.l_orderkey = o.o_orderkey"
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val withCbo =
      try spark.sql(q).queryExecution.optimizedPlan.stats
      finally spark.conf.set("spark.sql.cbo.enabled", "false")
    val withoutCbo = spark.sql(q).queryExecution.optimizedPlan.stats
    // stats-based costing produces a join row estimate; size-only does not
    assert(withCbo.rowCount.isDefined)
    assert(withoutCbo.rowCount.isEmpty)
    // the ndv-based estimate lands near the true join cardinality
    val actual = spark.sql(q).count()
    val est = withCbo.rowCount.get.toDouble
    assert(est > actual / 10.0 && est < actual * 10.0,
      s"estimate $est too far from actual $actual")
  }

  test("join reorder: CBO moves the selective dimension first") {
    setup()
    spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS " +
      "o_orderkey, o_custkey")
    spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR COLUMNS c_custkey")
    // written in a deliberately bad syntactic order: the two fact-ish
    // tables first, the small dimension last
    val q = """SELECT count(*)
      |FROM cbo_lineitem l, cbo_orders o, cbo_customer c
      |WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
      |  AND c.c_acctbal > 9000""".stripMargin
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    val cboPlan =
      try spark.sql(q).queryExecution.optimizedPlan.toString
      finally {
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "false")
      }
    val plainPlan = spark.sql(q).queryExecution.optimizedPlan.toString
    // the reordered plan must differ from the syntactic-order plan and
    // still produce the same result
    assert(cboPlan != plainPlan, "CBO join reorder did not change the plan")
    val n = spark.sql(q).collect().head.getLong(0)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try assert(spark.sql(q).collect().head.getLong(0) === n)
    finally {
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      spark.conf.set("spark.sql.cbo.enabled", "false")
    }
  }

  // ---- distinct-estimate.test ----------------------------------------
  // (`testdata/workloads/functional-planner/queries/PlannerTest/
  // distinct-estimate.test`): the reference pins (1) distinctpc as a
  // partial/merge 2-phase aggregation, (2) distinctpc merging THROUGH
  // the count(distinct) rewrite (the sketch rides the per-key first
  // phase as distinctpc, then merges), and — the property the plan
  // shape exists for — (3) grouping cardinality estimated from ndv.

  test("distinct-estimate.test: distinctpc is a 2-phase partial/merge aggregation") {
    val df = Engine.sql(spark, TestSpark.sf,
      "select distinctpc(l_orderkey) pc from lineitem")
    val s = df.queryExecution.sparkPlan.toString
    // partial sketch per partition, merge after the UNPARTITIONED
    // exchange (01:AGGREGATE / 03:AGGREGATE FINALIZE in the ref pin)
    assert(s.toLowerCase.contains("partial_distinctpc"), s)
    assert(s.split("Aggregate").length - 1 >= 2, s)
  }

  test("distinct-estimate.test: distinctpc merges through the count(distinct) rewrite") {
    val df = Engine.sql(spark, TestSpark.sf,
      "select count(distinct l_orderkey) cd, distinctpc(l_orderkey) pc " +
        "from lineitem")
    val s = df.queryExecution.sparkPlan.toString
    // the ref DISTRIBUTEDPLAN: phase 1 groups by l_orderkey carrying
    // distinctpc, later phases carry distinctpc:merge while counting
    // keys — Spark's RewriteDistinctAggregates produces the same
    // stacked-aggregate shape with the key in the early phase
    assert(s.contains("l_orderkey"), s)
    assert(s.split("Aggregate").length - 1 >= 3, s)
    assert(s.toLowerCase.contains("distinctpc"), s)
    val r = df.collect().head
    val exact = Engine.sql(spark, TestSpark.sf,
      "select count(distinct l_orderkey) c from lineitem").collect().head.getLong(0)
    assert(r.getLong(0) === exact)
    // the FM sketch estimate lands within its documented error band
    assert(r.getLong(1) > exact / 3 && r.getLong(1) < exact * 3,
      s"distinctpc=${r.getLong(1)} exact=$exact")
  }

  test("distinct-estimate: GROUP BY cardinality estimate tracks catalog ndv") {
    setup()
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS " +
      "o_custkey, o_orderpriority")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      def est(col: String): BigInt =
        spark.sql(s"SELECT $col FROM cbo_orders GROUP BY $col")
          .queryExecution.optimizedPlan.stats.rowCount.get
      def ndv(col: String): BigInt = {
        val stats = spark.table("cbo_orders")
          .queryExecution.optimizedPlan.stats.attributeStats
        stats.find(_._1.name == col).get._2.distinctCount.get
      }
      // high-ndv key: the estimate IS the ndv (SingleNodePlanner's
      // AggregationNode cardinality = product of grouping-col ndvs,
      // capped by input cardinality; Spark's AggregateEstimation same)
      assert(est("o_custkey") === ndv("o_custkey"))
      assert(est("o_orderpriority") === ndv("o_orderpriority"))
      // and the low-ndv group is estimated orders of magnitude smaller
      assert(est("o_orderpriority") * 10 < est("o_custkey"),
        s"${est("o_orderpriority")} vs ${est("o_custkey")}")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
