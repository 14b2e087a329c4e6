package graft.tools

import graft.{Engine, SparkEntry}

/** Dev scratchpad: time individual registry entries on a given data
  * dir (scale-sweep rows). Usage: QTime <dir> <name> [name ...] —
  * the whole LIST runs twice end-to-end (interleaved, the Bench
  * protocol) and each query reports the min across passes, so the
  * second sample is steady-state instead of paying first-touch JIT.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val spark = Engine.session("32")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val p1 = names.map(once)
    val p2 = names.map(once)
    names.indices.foreach { i =>
      val t = math.min(p1(i), p2(i))
      println(f"[${names(i)}] $t%.2f s (min of 2 interleaved) @ $dir")
    }
    spark.stop()
  }
}
