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
}
