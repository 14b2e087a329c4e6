package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExactQuantile

/** Pins for distributed exact selection: order-statistic equality with
  * a sorted reference (duplicates, negatives, extremes) and the
  * logarithmic round bound that makes it a scan-count win over a
  * global sort.
  */
class ExactQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kth-smallest equals the sorted reference on a messy domain") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    // heavy duplicates, negatives, and a huge-magnitude outlier pair
    val vals = Seq.fill(5000)(rnd.nextInt(200) - 100L) ++
      Seq(Long.MinValue / 4, Long.MaxValue / 4)
    val df = vals.toDF("v").repartition(7)
    val sorted = vals.sorted
    for (k <- Seq(1L, 2L, 500L, 2501L, 4999L, vals.size.toLong)) {
      val (got, rounds) = ExactQuantile.kthSmallest(df, col("v"), k)
      assert(got == sorted((k - 1).toInt), s"k=$k")
      // range ~ 2^61 -> at most ceil(61/8) = 8 rounds of 256-way refine
      assert(rounds <= 8, s"k=$k took $rounds rounds")
    }
  }

  test("constant column resolves in zero rounds; k bounds enforced") {
    import spark.implicits._
    val df = Seq.fill(100)(42L).toDF("v")
    val (v, rounds) = ExactQuantile.kthSmallest(df, col("v"), 50L)
    assert(v == 42L && rounds == 0)
    intercept[IllegalArgumentException] {
      ExactQuantile.kthSmallest(df, col("v"), 101L)
    }
  }

  test("driver entry matches DuckDB-style order statistics") {
    val out = SparkEntry.queries("exact_quantiles")(spark, TestSpark.sf)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val qs = Engine.table(spark, TestSpark.sf, "lineitem")
      .select(col("l_quantity").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    def ref(p: Int): Double = qs(math.max(1, (p * qs.length + 99) / 100) - 1)
    assert(out == Map(50 -> ref(50), 90 -> ref(90), 99 -> ref(99)))
  }
}
