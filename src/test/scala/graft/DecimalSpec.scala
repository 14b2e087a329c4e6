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

  /** Pinned divergence table vs TypesUtil.java getDecimalArithmeticResultType
    * (`fe/.../analysis/TypesUtil.java:155-194`):
    *
    * | op  | v1 rule                                   | Spark rule                | diverges |
    * |-----|-------------------------------------------|---------------------------|----------|
    * | +/- | (sMax+max(p1-s1,p2-s2)+1, sMax)           | identical (pre-cap)       | only at 38-cap |
    * | *   | (p1+p2, s1+s2)                            | (p1+p2+1, s1+s2)          | +1 precision, same values |
    * | /   | scale=max(4, s1+p2+1), prec=p1-s1+s2+scale| scale=max(6, s1+p2+1)     | min-scale 4 vs 6 |
    * | %   | (min(p1-s1,p2-s2)+sMax, sMax)             | identical                 | no |
    *
    * Value-level: the only *value* differences occur where the extra
    * digits exist only on one side — division when s1+p2+1 < 6 (Spark
    * keeps 6 fractional digits, v1 keeps 4; the shared 4 digits agree) and
    * at the 38-digit cap (Spark drops scale, v1 drops precision headroom).
    * Per SURVEY 7.3 these are accepted divergences; no shim is installed
    * because no case produces *different digits at a shared scale*.
    */
  test("typing grid: each op's result type is pinned vs the v1 rule") {
    def t(expr: String): DecimalType =
      Engine.sql(spark, TestSpark.sf,
        "SELECT CAST(1 AS DECIMAL(5,2)) x, CAST(1 AS DECIMAL(7,3)) y")
        .selectExpr(expr).schema.fields.head.dataType.asInstanceOf[DecimalType]
    // add: sMax + max(p1-s1, p2-s2) + 1 = 3+4+1 -> v1 (8,3) == Spark (8,3)
    assert(t("x + y") === DecimalType(8, 3))
    // mul: v1 (12,5), Spark adds one precision digit -> (13,5)
    assert(t("x * y") === DecimalType(13, 5))
    // div: s1+p2+1 = 2+7+1 = 10 >= 6 -> both engines (5-2+3+10, 10) = (16,10)
    assert(t("x / y") === DecimalType(16, 10))
    // mod: v1 (min(3,4)+3, 3) = (6,3) == Spark
    assert(t("x % y") === DecimalType(6, 3))
  }

  test("small-scale division: Spark min-scale 6 vs v1 min-scale 4, shared digits agree") {
    // DECIMAL(2,1)/DECIMAL(2,1): s1+p2+1 = 4 -> v1 scale 4, Spark scale 6
    val df = Engine.sql(spark, TestSpark.sf,
      "SELECT CAST(1.0 AS DECIMAL(2,1)) / CAST(3.0 AS DECIMAL(2,1)) q")
    val ty = df.schema.fields.head.dataType.asInstanceOf[DecimalType]
    assert(ty.scale === 6)
    // Spark's 6-digit value rounds to the v1 4-digit value: 0.333333 -> 0.3333
    assert(df.head().getDecimal(0).toPlainString === "0.333333")
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
