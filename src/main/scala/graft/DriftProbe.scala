package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession

/** Cross-round bench-drift diagnosis (r11 verdict "Next round" #1).
  *
  * The judge's clean r11 re-run showed TPC-DS median 1.31x and prim_*
  * median 1.19x vs r10 on UNCHANGED query code (TPC-H flat). This main
  * runs the prescribed attribution experiment:
  *
  *   fresh    — new JVM, warmup, then time the target entries N times.
  *   loaded:K — same, but first run K other registry entries once
  *              (default 50), replicating the session state a target
  *              sees deep into a full bench pass.
  *
  * Each rep splits driver-side plan cost (DataFrame build +
  * executedPlan) from execution, and JVM pressure gauges (JIT code
  * heap, metaspace, cumulative GC time, loaded classes) are printed
  * before/after, so "analyzer/registry growth" and "JVM pressure" are
  * separately observable. Output: one JSON line per target.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("fresh")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    // static conf (JVM-global Janino class cache) — must be set at
    // session build; the protocol experiment compares 100 (default)
    // against a size that holds the whole registry
    val cgCache = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", cgCache)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.configure(spark)

    val targets = Seq("tpcds_q3", "tpcds_q46", "tpcds_q47",
      "prim_filter_bigint_sel", "prim_groupby_bigint_lowndv", "q6_revenue")

    def jvm(): String = {
      val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
      def used(sub: String): Long = pools.filter(_.getName.contains(sub))
        .map(_.getUsage.getUsed).sum / (1 << 20)
      val gc = ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
      val cl = ManagementFactory.getClassLoadingMXBean.getLoadedClassCount
      s""""code_heap_mb":${used("CodeHeap")},"metaspace_mb":${used("Metaspace")},"gc_ms":$gc,"classes":$cl"""
    }

    // warmup — identical to Bench.scala
    try {
      SparkEntry.queries("q1_pricing")(spark, sfDir).count()
      SparkEntry.queries("json_extract")(spark, sfDir).count()
      SparkEntry.queries("multimodal_decode_ppm")(spark, sfDir).count()
    } catch { case _: Throwable => () }
    println(s"""{"phase":"after_warmup",$jvm()}""")

    // protocol experiment (the r10->r11 bench-protocol change itself as
    // the drift cause): "backtoback" samples a target twice in a row
    // after a pass of K others (r10 protocol — the second sample reuses
    // the target's just-compiled generated classes); "interleaved"
    // samples the target, runs the K others, samples it again (r11
    // protocol — K other queries evict the target's classes from the
    // 100-entry codegen cache, so BOTH samples pay Janino compilation).
    if (mode.startsWith("backtoback") || mode.startsWith("interleaved")) {
      val k = mode.split(":").lift(1).map(_.toInt).getOrElse(50)
      val byName0 = SparkEntry.all.map(q => q.name -> q).toMap
      val others = SparkEntry.all.filter(q => !targets.contains(q.name)).take(k)
      def pass(): Unit = others.foreach { q =>
        try q.run(spark, sfDir).count() catch { case _: Throwable => () }
      }
      def sample(name: String): Double = {
        val t0 = System.nanoTime()
        byName0(name).run(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      targets.foreach { name =>
        val (s1, s2) =
          if (mode.startsWith("backtoback")) {
            pass(); val a = sample(name); val b = sample(name); (a, b)
          } else {
            val a = sample(name); pass(); val b = sample(name); (a, b)
          }
        println(f"""{"target":"$name","mode":"$mode","cgCache":$cgCache,"s1":$s1%.4f,"s2":$s2%.4f,"min":${math.min(s1, s2)}%.4f,$jvm()}""")
      }
      spark.stop()
      return
    }

    if (mode.startsWith("loaded")) {
      val k = mode.split(":").lift(1).map(_.toInt).getOrElse(50)
      val others = SparkEntry.all.filter(q => !targets.contains(q.name)).take(k)
      others.foreach { q =>
        try q.run(spark, sfDir).count() catch { case _: Throwable => () }
      }
      println(s"""{"phase":"after_loaded_${others.size}",$jvm()}""")
    }

    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    targets.foreach { name =>
      val q = byName(name)
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = q.run(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analysis + optimize + physical
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      def arr(f: ((Double, Double, Double)) => Double): String =
        samples.map(s => f"${f(s)}%.4f").mkString("[", ",", "]")
      println(s"""{"target":"$name","mode":"$mode","build":${arr(_._1)},"plan":${arr(_._2)},"exec":${arr(_._3)},$jvm()}""")
    }
    spark.stop()
  }
}
