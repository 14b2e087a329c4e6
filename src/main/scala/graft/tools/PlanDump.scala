package graft.tools

import graft.{Engine, SparkEntry}

/** Dev scratchpad: print the formatted physical plan of registry
  * entries (plan-audit helper).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Engine.session("8")
    try args.tail.foreach { n =>
      println(s"===== $n")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    } finally spark.stop()
  }
}
