package graft

import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** DECIMAL result-type semantics (SURVEY.md section 7.3 risk register).
  *
  * The reference's v1 rules (`fe/.../analysis/TypesUtil.java`,
  * `be/src/exprs/decimal-operators.cc`):
  *   add/sub: scale = max(s1,s2), precision = max(p1-s1, p2-s2)+scale+1
  *   mul:     precision = p1+p2, scale = s1+s2
  *   div:     scale = s1+s2, precision widened by the divisor's digits
  * Spark's rules (DecimalPrecision) agree on add/sub and mul *until* the
  * 38-digit cap, where Spark reduces scale to preserve integral digits
  * (allowPrecisionLoss=true) while Impala v1 errors/NULLs. Division
  * differs systematically: Spark targets scale max(6, s1+p2+1).
  *
  * These tests pin the engine's actual behavior so any Spark upgrade that
  * shifts decimal typing is caught, and they document the deliberate
  * divergences from the reference.
  */
class DecimalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def typeOf(expr: String): DecimalType =
    Engine.sql(spark, TestSpark.sf,
      s"SELECT CAST(1.1 AS DECIMAL(10,2)) a, CAST(2.42 AS DECIMAL(20,10)) b")
      .selectExpr(expr).schema.fields.head.dataType.asInstanceOf[DecimalType]

  test("add: scale=max(s1,s2), precision=max(int digits)+scale+1 (matches v1)") {
    // max(p1-s1, p2-s2) + max(s1,s2) + 1 = max(8,10)+10+1 = 21
    assert(typeOf("a + b") === DecimalType(21, 10))
  }

  test("multiply: precision=p1+p2+1, scale=s1+s2 (v1: p1+p2)") {
    // Spark adds one extra precision digit vs the reference's rule
    assert(typeOf("a * b") === DecimalType(31, 12))
  }

  test("divide: Spark widens scale to at least 6 (diverges from v1 s1+s2)") {
    val t = typeOf("a / b")
    assert(t.scale >= 6)
  }

  test("38-digit cap reduces scale rather than failing (Spark precision-loss)") {
    val t = Engine.sql(spark, TestSpark.sf,
      "SELECT CAST(1 AS DECIMAL(38,10)) * CAST(1 AS DECIMAL(38,10)) p")
      .schema.fields.head.dataType.asInstanceOf[DecimalType]
    assert(t.precision === 38)
    assert(t.scale < 20) // exact v1 would demand scale 20 and overflow
  }

  test("decimal sums are exact and associative (the Det contract)") {
    val r = Engine.sql(spark, TestSpark.sf,
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING) s
        |FROM lineitem""".stripMargin).head().getString(0)
    val r17 = Engine.table(spark, TestSpark.sf, "lineitem")
      .repartition(17)
      .selectExpr("CAST(l_extendedprice AS DECIMAL(18,2)) p")
      .agg(org.apache.spark.sql.functions.sum("p").cast("string"))
      .head().getString(0)
    assert(r === r17)
  }
}
