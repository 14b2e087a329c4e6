package graft.tools

import graft.{Engine, SparkEntry}

/** Dev scratchpad: per-entry plan audit — executes a registry entry and
  * prints the final adaptive plan's scan count per source file and
  * whether AQE reused any exchange. Usage: PlanAudit <dir> <name>...
  * (Counts come from the executed plan STRING, which prints the final
  * plan followed by the initial plan — divide by 2 mentally, or
  * compare entries relatively.)
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Engine.session("32")
    for (name <- args.tail) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      val scans = "file:[^,\\]]*\\.parquet".r.findAllIn(p).toSeq
        .groupBy(identity).map { case (k, v) =>
          k.substring(k.lastIndexOf('/') + 1) -> v.size }
      println(s"[$name] reused=${p.contains("ReusedExchange")} " +
        s"exchanges=${p.split("Exchange hashpartitioning").length - 1} " +
        s"scans=${scans.toSeq.sortBy(_._1).mkString(", ")}")
    }
    spark.stop()
  }
}
