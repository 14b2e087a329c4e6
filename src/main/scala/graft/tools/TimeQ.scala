package graft.tools

import graft.{Engine, SparkEntry}

/** Dev scratchpad: wall-time one or more registry entries at a given sf
  * dir (arg 1), printing per-run seconds — separates first-run (codegen
  * compile) cost from steady-state.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail
    val spark = Engine.session("32")
    try names.foreach { n =>
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.mode("overwrite")
          .format("noop").save()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    } finally spark.stop()
  }
}
