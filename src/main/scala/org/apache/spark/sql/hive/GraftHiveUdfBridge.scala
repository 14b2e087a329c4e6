package org.apache.spark.sql.hive

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private bridge into spark-hive's UDF expression wrappers.
  *
  * `HiveSimpleUDF`/`HiveGenericUDF` and `HiveShim.HiveFunctionWrapper`
  * are `private[hive]`, so the graft engine reaches them through this
  * one-file shim in their package — the established pattern for Spark
  * extensions that need the Hive interop layer without a Hive metastore.
  */
object GraftHiveUdfBridge {

  /** Wrap a class extending org.apache.hadoop.hive.ql.exec.UDF. */
  def simpleUdf(name: String, className: String,
      args: Seq[Expression]): Expression =
    HiveSimpleUDF(name, HiveShim.HiveFunctionWrapper(className), args)

  /** Wrap a class extending o.a.h.hive.ql.udf.generic.GenericUDF. */
  def genericUdf(name: String, className: String,
      args: Seq[Expression]): Expression =
    HiveGenericUDF(name, HiveShim.HiveFunctionWrapper(className), args)
}
