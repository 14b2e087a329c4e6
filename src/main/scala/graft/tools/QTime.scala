package graft.tools

import graft.{Engine, SparkEntry}

/** Dev scratchpad: time individual registry entries on a given data
  * dir (scale-sweep rows). Usage: QTime <dir> <name> [name ...] —
  * each query runs twice, min reported (the Bench protocol).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Engine.session("32")
    for (name <- args.tail) {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      println(f"[$name] $t%.2f s (min of 2) @ $dir")
    }
    spark.stop()
  }
}
