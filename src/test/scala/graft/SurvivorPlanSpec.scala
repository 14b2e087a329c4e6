package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** Plan-shape pin for the skew-proof survivor pick (DedupOps.survivorPick,
  * the r9/r10 mega-cluster fix): the per-cluster best must be a 2-phase
  * aggregate — map-side partial, exchange on cluster_id, final — and the
  * pick must contain NO Window node. A row_number window partitioned by
  * cluster_id funnels an entire cluster through one task (the
  * straggler/spill bomb on boilerplate mega-clusters); partial
  * aggregation reduces each task's slice of a cluster to one buffer row
  * before the shuffle. Note: max(struct(...)) is not hash-aggregable, so
  * Spark plans it as SortAggregate — the pin asserts the partial+final
  * SHAPE, not the aggregate flavor.
  */
class SurvivorPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 100 clusters x 100 members, n_chars non-monotone in doc_id so the
  // pick is not trivially the max id
  private def members = {
    Engine.configure(spark)
    spark.range(0, 10000, 1, 8).select(
      (col("id") % 100).as("cluster_id"),
      col("id").as("doc_id"),
      (col("id") * 31 % 997).as("n_chars"))
  }

  test("survivor pick plans partial+final aggregation on cluster_id, no Window") {
    val picked = DedupOps.survivorPick(members)
    picked.collect() // materialize so AQE settles the final plan
    val full = picked.queryExecution.executedPlan.toString
    // AQE prints "== Final Plan ==" then "== Initial Plan ==" — pin the
    // final (executed) plan only
    val plan = full.split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"),
      s"survivor pick must not contain a Window node:\n$plan")
    assert(plan.contains("partial_max"),
      s"expected a map-side partial max before the shuffle:\n$plan")
    assert("SortAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final SortAggregate pair:\n$plan")
    assert(plan.contains("hashpartitioning(cluster_id"),
      s"expected the aggregate exchange keyed on cluster_id:\n$plan")
  }

  test("survivor pick keeps exactly the lexicographic-max (n_chars, doc_id) per cluster") {
    val rows = DedupOps.survivorPick(members)
      .select("cluster_id", "doc_id", "n_chars", "keep").collect()
    assert(rows.length === 10000)
    rows.groupBy(_.getLong(0)).foreach { case (_, ms) =>
      val keepers = ms.filter(_.getBoolean(3))
      assert(keepers.length === 1)
      val best = ms.maxBy(r => (r.getLong(2), r.getLong(1)))
      assert(keepers.head.getLong(1) === best.getLong(1))
    }
  }
}
