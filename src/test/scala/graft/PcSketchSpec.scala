package graft

import org.scalatest.funsuite.AnyFunSuite

/** Flajolet-Martin PC/PCSA estimator checks (the reference's
  * distinct-estimate.test asserts only determinism + magnitude; FM's
  * published standard error is ~0.78/sqrt(64) ~ 10% for PC and somewhat
  * wider for PCSA at small n).
  */
class PcSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def est(fn: String, expr: String, from: String): Long =
    Engine.sql(spark, TestSpark.sf, s"SELECT $fn($expr) FROM $from")
      .head().getLong(0)

  test("distinctpc lands within FM error bounds on known cardinalities") {
    // FM's ~10% published error needs n >> nmaps (64); use the ~1500-key
    // column. Small-n inputs (e.g. 150 keys over 64 maps) sit in FM's
    // known low-bias regime — the magnitude test below covers that range.
    val exact = Engine.sql(spark, TestSpark.sf,
      "SELECT count(distinct l_orderkey) FROM lineitem").head().getLong(0)
    val pc = est("distinctpc", "l_orderkey", "lineitem")
    assert(math.abs(pc - exact).toDouble / exact < 0.35,
      s"pc=$pc exact=$exact")
  }

  test("distinctpcsa is coarser but the right magnitude") {
    val exact = Engine.sql(spark, TestSpark.sf,
      "SELECT count(distinct l_orderkey) FROM lineitem").head().getLong(0)
    val pcsa = est("distinctpcsa", "l_orderkey", "lineitem")
    assert(pcsa > exact / 4 && pcsa < exact * 4, s"pcsa=$pcsa exact=$exact")
  }

  test("estimates are deterministic and merge-invariant across partitioning") {
    import org.apache.spark.sql.functions._
    val a = est("distinctpc", "c_custkey", "customer")
    val b = Engine.table(spark, TestSpark.sf, "customer")
      .repartition(13)
      .agg(call_function("distinctpc", col("c_custkey")))
      .head().getLong(0)
    assert(a === b)
    val c = Engine.table(spark, TestSpark.sf, "customer")
      .repartition(3)
      .agg(call_function("distinctpcsa", col("c_custkey")))
      .head().getLong(0)
    val d = est("distinctpcsa", "c_custkey", "customer")
    assert(c === d)
  }

  test("empty input estimates zero") {
    assert(est("distinctpc", "o_custkey", "orders WHERE o_orderkey < 0") === 0L)
  }
}
