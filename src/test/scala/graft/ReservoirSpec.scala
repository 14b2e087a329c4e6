package graft

import org.scalatest.funsuite.AnyFunSuite

class ReservoirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("appx_median_rs is exact below reservoir capacity") {
    // 6k lineitem rows < 20k reservoir => the sample IS the data
    val r = Engine.sql(spark, TestSpark.sf,
      """SELECT appx_median_rs(l_quantity) m,
        |       percentile(l_quantity, 0.5) p
        |FROM lineitem""".stripMargin).head()
    // upper median vs interpolated: within one unit of quantity
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1.0)
  }

  test("histogram returns 34 non-decreasing bucket bounds") {
    val s0 = Engine.sql(spark, TestSpark.sf,
      "SELECT histogram(l_extendedprice) h FROM lineitem").head().getString(0)
    val bounds = s0.split(", ").map(_.toDouble)
    assert(bounds.length === 34)
    assert(bounds.zip(bounds.tail).forall { case (a, b) => a <= b })
    // last bound is the max when below capacity
    val mx = Engine.sql(spark, TestSpark.sf,
      "SELECT max(l_extendedprice) FROM lineitem").head().getDouble(0)
    assert(bounds.last === mx)
  }

  test("histogram survives repartitioned merge") {
    import org.apache.spark.sql.functions._
    val h = Engine.table(spark, TestSpark.sf, "lineitem")
      .repartition(13)
      .agg(call_function("histogram", col("l_quantity")))
      .head().getString(0)
    assert(h.split(", ").length === 34)
  }
}
