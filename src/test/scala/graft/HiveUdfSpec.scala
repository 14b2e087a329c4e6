package graft

import graft.functions.HiveUdx
import org.scalatest.funsuite.AnyFunSuite

/** Hive UDF interop (SURVEY 2.6: the reference runs Java/Hive UDFs via
  * UdfExecutor.java) — both hive-exec builtin classes and a user-written
  * UDF class execute through the engine's SQL front door.
  */
class HiveUdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hive-exec builtin simple UDFs run by class name") {
    HiveUdx.registerHiveSimpleUdf(spark, "hive_reverse",
      "org.apache.hadoop.hive.ql.udf.UDFReverse")
    HiveUdx.registerHiveSimpleUdf(spark, "hive_ascii",
      "org.apache.hadoop.hive.ql.udf.UDFAscii")
    val r = Engine.sql(spark, TestSpark.sf,
      "SELECT hive_reverse('hello'), hive_ascii('abc')").head()
    assert(r.getString(0) === "olleh")
    assert(r.getInt(1) === 97)
  }

  test("hive-exec GenericUDF runs by class name") {
    HiveUdx.registerHiveGenericUdf(spark, "hive_instr",
      "org.apache.hadoop.hive.ql.udf.generic.GenericUDFInstr")
    val r = Engine.sql(spark, TestSpark.sf,
      "SELECT hive_instr('foobar', 'bar')").head()
    assert(r.getInt(0) === 4)
  }

  test("user-written Hive UDF class executes over table data") {
    HiveUdx.registerHiveSimpleUdf(spark, "snake_case",
      classOf[graft.functions.SnakeCaseHiveUdf].getName)
    val rows = Engine.sql(spark, TestSpark.sf,
      """SELECT n_name, snake_case(n_name) AS snaked FROM nation
        |WHERE n_nationkey < 3 ORDER BY n_nationkey""".stripMargin).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getString(1) === r.getString(0).trim.split("\\s+")
        .map(_.toLowerCase).mkString("_"))
    }
  }

  test("null propagation through the Hive bridge") {
    HiveUdx.registerHiveSimpleUdf(spark, "snake_case2",
      classOf[graft.functions.SnakeCaseHiveUdf].getName)
    val r = Engine.sql(spark, TestSpark.sf,
      "SELECT snake_case2(CAST(NULL AS STRING))").head()
    assert(r.isNullAt(0))
  }
}
