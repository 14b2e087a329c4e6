package graft.tools

import graft.{Engine, SparkEntry}

/** Warm single-entry timer for local iteration: runs each named entry
  * once to warm codegen/footers, then times a second run.
  * Usage: TimeEntry <sfDir> <entry> [entry...]
  */
object TimeEntry {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    Engine.configure(spark)
    args.tail.foreach { name =>
      SparkEntry.queries(name)(spark, dir).count() // warm
      // drop leaked checkpoint blocks between runs (the Bench r15
      // inter-query hygiene) so repeats measure the query, not the
      // accumulated storage pressure
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      println(f"[time] $name $dt%.3f s rows=$n")
    }
  }
}
