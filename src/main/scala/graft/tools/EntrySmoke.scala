package graft.tools

import graft.SparkEntry
import graft.Engine

/** Replicates the driver's t1 smoke: SparkEntry.entry on sf0.001 must
  * return rows.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("8")
    try {
      val n = SparkEntry.entry(spark).count()
      println(s"entry rows: $n")
      require(n > 0, "driver smoke would fail: entry returned 0 rows")
    } finally spark.stop()
  }
}
