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

  test("histogram returns 100 non-decreasing bucket bounds (reference layout)") {
    val s0 = Engine.sql(spark, TestSpark.sf,
      "SELECT histogram(l_extendedprice) h FROM lineitem").head().getString(0)
    val bounds = s0.split(", ").map(_.toDouble)
    assert(bounds.length === 100) // min(n, 100) with n >= 100
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
    assert(h.split(", ").length === 100)
  }

  test("sample() returns every value below capacity, a subset above") {
    // below capacity: all values kept, reservoir order = input order
    val small = Engine.sql(spark, TestSpark.sf,
      "SELECT sample(n_nationkey) FROM nation").head().getString(0)
    assert(small.split(", ").map(_.toInt).sorted.toSeq === (0 until 25))
    // grouped: per-group samples stay within the group's value range
    val rows = Engine.sql(spark, TestSpark.sf,
      """SELECT l_linenumber, sample(l_quantity) s FROM lineitem
        |GROUP BY l_linenumber""".stripMargin).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val vals = r.getString(1).split(", ").map(_.toDouble)
      assert(vals.forall(v => v >= 1 && v <= 50))
    }
  }

  test("weighted reservoir merge keeps side proportions roughly fair") {
    // one side saw 10x the rows; its share of the merged sample must
    // dominate accordingly (exact proportion is random, bound loosely)
    val a = new graft.functions.Reservoir(1000, seed = 1)
    val b = new graft.functions.Reservoir(1000, seed = 2)
    (1 to 100000).foreach(_ => a.add(1.0))
    (1 to 10000).foreach(_ => b.add(2.0))
    a.mergeFrom(b)
    assert(a.seen === 110000L)
    assert(a.n === 1000)
    val fromA = a.values.take(a.n).count(_ == 1.0)
    assert(fromA > 800 && fromA < 980, s"fromA=$fromA")
  }
}
