package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.ImpalaFunctions

/** SparkSessionExtensions entry point: enables the full dialect-function
  * surface at session build time with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — no Engine call needed. This is the library-distribution analog of
  * the reference's builtin registration at catalog startup
  * (`fe/.../catalog/BuiltinsDb.java`): every function in
  * `ImpalaFunctions.builders` is injected as a session-bound builtin.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ImpalaFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.ImpalaFunctions", name),
        builder))
    }
  }
}
