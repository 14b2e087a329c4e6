package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** TPC-DS plan-shape parity with the reference's `tpcds-all.test`
  * (`testdata/workloads/functional-planner/queries/PlannerTest/
  * tpcds-all.test`). The registry's TPC-DS schema is DERIVED from the
  * driver tables (TpcdsQueries header), so the "fact" leaf in these
  * plans is the lineitem scan feeding the store_sales derivation; the
  * pinned decisions — star dims build while the fact streams, Top-N,
  * 2-phase aggregation, one-row-subquery combination, shared-CTE
  * exchange reuse — are the ones the reference file locks in.
  */
class PlannerSpec7 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // plan against sf0.1 for a real fact/dim size contrast (PlannerSpec5
  // rationale); planning only, nothing executes at that SF
  private def qBig(name: String): DataFrame =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  private def buildSubtrees(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case j: BroadcastHashJoinExec =>
      if (j.buildSide == BuildLeft) j.left else j.right }

  private def scanPaths(p: SparkPlan): Seq[String] =
    p.collectLeaves().collect { case f: FileSourceScanExec =>
      f.relation.location.rootPaths.mkString(",") }

  // TPCDS-Q3 (tpcds-all.test:30-56): item and date_dim build with their
  // selective predicates; store_sales streams (01:SCAN store_sales at
  // the bottom, runtime filters RF000/RF001 targeting it); 06:TOP-N
  // LIMIT=100 over the 2-phase brand/year aggregate.
  test("tpcds q3: star dims build, the derived fact streams, Top-N over 2-phase agg (tpcds-all.test:30-56)") {
    val p = qBig("tpcds_q3").queryExecution.sparkPlan
    val builds = buildSubtrees(p)
    assert(builds.nonEmpty, p.toString)
    assert(!builds.flatMap(scanPaths).exists(_.contains("lineitem")),
      s"fact on a build side:\n$p")
    val s = p.toString
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(s.split("HashAggregate").length - 1 >= 2, s)
  }

  // TPCDS-Q96 (tpcds-all.test:2817-2905): three selective dims
  // (time_dim t_hour/t_minute, household_demographics hd_dep_count,
  // store s_store_name) all build; the fact streams through the
  // 3-join chain into a 2-phase count.
  test("tpcds q96: three selective dims build around the streamed fact (tpcds-all.test:2817-2905)") {
    val p = qBig("tpcds_q96").queryExecution.sparkPlan
    val builds = buildSubtrees(p)
    assert(builds.nonEmpty, p.toString)
    assert(!builds.flatMap(scanPaths).exists(_.contains("lineitem")),
      s"fact on a build side:\n$p")
    val s = p.toString
    assert(s.split("HashAggregate").length - 1 >= 2, s)
  }

  // TPCDS-Q88 (tpcds-all.test:3554+): eight time-band count subqueries
  // each collapse to a single-row aggregate and the SELECT * combines
  // them as one-row nested-loop (cross) joins — eight independent agg
  // subtrees, never a data-sized cartesian.
  test("tpcds q88: eight 1-row aggs combined by broadcast NLJ (tpcds-all.test:3554+)") {
    val s = q("tpcds_q88").queryExecution.sparkPlan.toString
    assert(s.split("BroadcastNestedLoopJoin").length - 1 >= 7, s)
    // each band is its own 2-phase count: >= 16 HashAggregate nodes
    assert(s.split("HashAggregate").length - 1 >= 16, s)
    assert(!s.contains("CartesianProduct"), s)
  }

  // TPCDS-Q59 (tpcds-all.test:1594-1852): the shared weekly-sales CTE
  // (wss) is referenced twice (current week vs +52); the reference
  // materializes the shared subtree once per fragment — Spark's AQE
  // exchange reuse must dedup the repeated aggregate-exchange at
  // runtime (the PlannerSpec2 q15 recipe).
  test("tpcds q59: shared weekly CTE materializes once (tpcds-all.test:1594-1852)") {
    val df = q("tpcds_q59")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val reused = p.contains("ReusedExchange") || {
      val stageIds = "ShuffleQueryStage (\\d+)".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      stageIds.size > stageIds.distinct.size
    }
    assert(reused, p)
  }
}
