package graft.tools

import graft.Engine
import org.apache.spark.sql.functions._

/** Dev scratchpad: schema probes + plan dumps against the local testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("8")
    val dir = "/root/testdata/sf0.001"
    try {
      if (args.nonEmpty) {
        args.foreach { q =>
          println(s"-- $q")
          try Engine.sql(spark, dir, q).show(30, truncate = false)
          catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
        }
      } else {
        for (t <- Engine.tableNames) {
          val df = Engine.table(spark, dir, t)
          println(s"== $t: ${df.schema.simpleString}")
        }
        Engine.sql(spark, dir,
          "SELECT fnv_hash('hello') h, strleft('abcdef', 3) l, quotient(11, 3) q").show()
      }
    } finally spark.stop()
  }
}
