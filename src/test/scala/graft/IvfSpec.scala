package graft

import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sim_ivf is deterministic (decimal-exact centroids) and bounded") {
    val run1 = SparkEntry.queries("sim_ivf")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    val run2 = SparkEntry.queries("sim_ivf")(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    assert(run1 === run2)
    assert(run1.nonEmpty)
    val perQuery = run1.groupBy(_.head).values
    assert(perQuery.forall(_.size <= 3))
  }

  test("ivf scores agree with the exact dot product for returned pairs") {
    import org.apache.spark.sql.functions._
    val ivf = SparkEntry.queries("sim_ivf")(spark, TestSpark.sf)
      .withColumnRenamed("score", "ivf_score")
    val exact = SparkEntry.queries("sim_topk_dot")(spark, TestSpark.sf)
    // pairs present in both rankings must carry the same similarity value
    val joined = ivf.join(exact, Seq("qid", "vec_id"))
      .select(abs(col("ivf_score") - col("dot")).as("diff"))
      .collect()
    assert(joined.forall(_.getDouble(0) < 1e-9))
  }
}
