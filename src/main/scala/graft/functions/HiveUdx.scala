package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.GraftHiveUdfBridge

/** Hive UDF interop — the reference's `CREATE FUNCTION ... LOCATION
  * 'udf.jar' SYMBOL='com.example.MyUdf'` surface for Java/Hive UDFs
  * (`fe/.../analysis/CreateUdfStmt.java`, executed through
  * `fe/.../hive/executor/UdfExecutor.java`): any class extending
  * `org.apache.hadoop.hive.ql.exec.UDF` (simple) or `GenericUDF` can be
  * registered by class name and called from SQL or the Column API.
  *
  * The classes must be on the executor classpath (here: the test jar or
  * hive-exec's own builtins) — same contract as the reference, which
  * ships the jar to executors.
  */
object HiveUdx {

  def registerHiveSimpleUdf(spark: SparkSession, name: String,
      className: String): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, args => GraftHiveUdfBridge.simpleUdf(name, className, args),
      "hive")

  def registerHiveGenericUdf(spark: SparkSession, name: String,
      className: String): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, args => GraftHiveUdfBridge.genericUdf(name, className, args),
      "hive")
}

/** A user-written simple Hive UDF (the kind the reference's UdfExecutor
  * runs): snake_cases an input string.
  */
class SnakeCaseHiveUdf extends org.apache.hadoop.hive.ql.exec.UDF {
  def evaluate(s: String): String =
    if (s == null) null
    else s.trim.split("\\s+").map(_.toLowerCase).mkString("_")
}
