package graft.tools

import graft.{Engine, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev scratchpad: per-entry stage profile — runs a registry entry
  * (steady-state: twice, profiling the second run) and prints job
  * count, stage count, and the top stages by wall time with task
  * counts and shuffle bytes. This is the guide-§1 "where does the
  * time go" attribution for queries whose cost isn't visible in the
  * plan alone (tiny inputs, many tiny jobs, serial scans).
  * Usage: StageProf <dir> <name>...
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sc = spark.sparkContext
    for (name <- args.tail) {
      // warmup pass: codegen + JIT out of the profile
      try SparkEntry.queries(name)(spark, dir).count()
      catch { case e: Throwable =>
        println(s"[$name] warmup failed: ${e.getMessage}") }
      val stages = collection.mutable.ArrayBuffer
        .empty[(Int, String, Int, Long, Long, Long, Long)]
      val details = collection.mutable.Map.empty[Int, String]
      var jobs = 0
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          synchronized { jobs += 1 }
        override def onStageCompleted(
            s: SparkListenerStageCompleted): Unit = synchronized {
          val i = s.stageInfo
          val wall = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(0L)
          val m = i.taskMetrics
          stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(80),
            i.numTasks, wall,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.executorRunTime))
          details(i.stageId) = i.details.linesIterator
            .filter(_.contains("graft")).take(3).mkString(" | ")
        }
      }
      sc.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      sc.removeSparkListener(listener)
      val totalStageWall = stages.map(_._4).sum
      println(f"[$name] rows=$n wall=$wall%.2f s jobs=$jobs " +
        s"stages=${stages.size} stageWallSum=${totalStageWall}ms")
      stages.sortBy(-_._4).take(12).foreach {
        case (id, nm, tasks, w, sr, sw, run) =>
          println(f"    stage $id%4d ${w}%6d ms tasks=$tasks%3d " +
            f"run=${run}ms shufR=${sr / 1024}K shufW=${sw / 1024}K  " +
            details.getOrElse(id, nm))
      }
    }
    spark.stop()
  }
}
