package graft.tools

import graft.Engine
import graft.operators.DedupOps

/** Dev scratchpad: does the star-edge plan reuse the banded-signature
  * exchange across its two consumers (bucket-min agg + probe join), or
  * does the corpus get scanned and signed twice?
  */
object StarPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    val spark = Engine.session("32")
    val df = DedupOps.minhashStarEdges(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("REUSED=" + p.contains("ReusedExchange"))
    println("SCANS=" + p.split("FileScan").length)
    println(p.linesIterator.filter(l => l.contains("Exchange") ||
      l.contains("FileScan") || l.contains("Reused")).mkString("\n"))
    spark.stop()
  }
}
