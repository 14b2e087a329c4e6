package graft

import org.scalatest.funsuite.AnyFunSuite

class NdvHllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ndv_hll estimates within HLL-1024 error bounds") {
    // rsd ~ 1.04/sqrt(1024) = 3.25%; allow 4 sigma on 6000 distinct keys
    val r = Engine.sql(spark, TestSpark.sf,
      """SELECT ndv_hll(l_orderkey) est, count(distinct l_orderkey) x
        |FROM lineitem""".stripMargin).head()
    val (est, x) = (r.getLong(0), r.getLong(1))
    assert(math.abs(est - x).toDouble / x < 0.13, s"est=$est exact=$x")
  }

  test("ndv_hll small-cardinality linear counting is near-exact") {
    val r = Engine.sql(spark, TestSpark.sf,
      "SELECT ndv_hll(l_suppkey) est FROM lineitem").head()
    assert(r.getLong(0) === 10L) // linear counting regime: exact for tiny n
  }

  test("ndv_hll merges across partitions consistently") {
    // same data shuffled into different partition layouts must agree
    // (bucket-wise max merge is associative/commutative)
    val a = Engine.sql(spark, TestSpark.sf,
      "SELECT ndv_hll(l_partkey) FROM lineitem").head().getLong(0)
    val b = Engine.table(spark, TestSpark.sf, "lineitem")
      .repartition(17)
      .agg(org.apache.spark.sql.functions.call_function("ndv_hll",
        org.apache.spark.sql.functions.col("l_partkey")))
      .head().getLong(0)
    assert(a === b)
  }

  test("ndv_no_finalize returns the raw 1 KiB sketch whose estimate matches ndv_hll") {
    val row = Engine.sql(spark, TestSpark.sf,
      """SELECT ndv_no_finalize(l_partkey) sketch, ndv_hll(l_partkey) est
        |FROM lineitem""".stripMargin).head()
    val sketch = row.getAs[Array[Byte]](0)
    assert(sketch.length === 1024)
    // finalizing the returned sketch reproduces the estimate exactly
    val est = graft.functions.NdvHll(
      org.apache.spark.sql.catalyst.expressions.Literal(0L)).eval(sketch)
    assert(est === row.getLong(1))
  }
}
